"""Minimal read-only LMDB environment reader, pure Python.

The reference reads LSUN datasets through the `lmdb` package
(`/root/reference/dataset.py:9-48`); that package is not available in
this build environment, so this module implements enough of the LMDB
file format (http://www.lmdb.tech/doc/, data.mdb B+tree) to iterate and
fetch values from a read-only environment: meta-page parsing, branch /
leaf node traversal, and overflow-page values. Supports the common
64-bit little-endian layout with 4096-byte pages.

Not supported (not needed for LSUN-style image stores): DUPSORT subtrees,
named sub-databases beyond the main DB, writes.
"""

from __future__ import annotations

import mmap
import os
import struct
from typing import Iterator, Optional, Tuple

_MDB_MAGIC = 0xBEEFC0DE

# Page flags (mdb.c)
P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_LEAF2 = 0x20

# Node flags
F_BIGDATA = 0x01


class LMDBReader:
    """Read-only access to an LMDB data.mdb file."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self.psize, self.root, self.entries = self._read_meta()

    def close(self):
        self._mm.close()
        self._f.close()

    # -- file structure ----------------------------------------------------

    def _parse_meta(self, off0: int):
        """Parse one meta page at byte offset off0.

        Layout after the 16-byte page header (MDB_meta, mdb.c):
          mm_magic(4) mm_version(4) mm_address(8) mm_mapsize(8)
          mm_dbs[2] (2 x 48-byte MDB_db: pad(4) flags(2) depth(2)
            branch(8) leaf(8) overflow(8) entries(8) root(8))
          mm_last_pg(8) mm_txnid(8)
        mm_dbs[0].md_pad holds the environment page size.
        """
        base = off0 + 16
        magic = struct.unpack_from("<I", self._mm, base)[0]
        if magic != _MDB_MAGIC:
            return None
        psize = struct.unpack_from("<I", self._mm, base + 24)[0]
        main_db = base + 24 + 48
        entries = struct.unpack_from("<Q", self._mm, main_db + 32)[0]
        root = struct.unpack_from("<Q", self._mm, main_db + 40)[0]
        txnid = struct.unpack_from("<Q", self._mm, base + 24 + 96 + 8)[0]
        return txnid, psize, root, entries

    def _read_meta(self) -> Tuple[int, int, int]:
        meta0 = self._parse_meta(0)
        if meta0 is None:
            raise ValueError("not an LMDB file (magic not found at page 0)")
        psize = meta0[1]
        meta1 = self._parse_meta(psize) if psize < len(self._mm) else None
        best = meta0 if (meta1 is None or meta0[0] >= meta1[0]) else meta1
        _, psize, root, entries = best
        return psize, root, entries

    def _page(self, pgno: int) -> int:
        return pgno * self.psize

    def _page_header(self, pgno: int):
        off = self._page(pgno)
        # MDB_page: pgno(8) pad(2) flags(2) lower(2) upper(2)
        flags = struct.unpack_from("<H", self._mm, off + 10)[0]
        lower = struct.unpack_from("<H", self._mm, off + 12)[0]
        return off, flags, lower

    def _num_keys(self, lower: int) -> int:
        return (lower - 16) // 2

    def _node(self, page_off: int, idx: int):
        ptr = struct.unpack_from("<H", self._mm, page_off + 16 + 2 * idx)[0]
        noff = page_off + ptr
        lo, hi, flags, ksize = struct.unpack_from("<HHHH", self._mm, noff)
        datasize = lo | (hi << 16)
        key = bytes(self._mm[noff + 8 : noff + 8 + ksize])
        return noff, flags, ksize, datasize, key

    def _leaf_value(self, noff: int, flags: int, ksize: int, datasize: int) -> bytes:
        if flags & F_BIGDATA:
            ovpg = struct.unpack_from("<Q", self._mm, noff + 8 + ksize)[0]
            data_off = self._page(ovpg) + 16
            return bytes(self._mm[data_off : data_off + datasize])
        voff = noff + 8 + ksize
        return bytes(self._mm[voff : voff + datasize])

    # -- traversal ----------------------------------------------------------

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        """In-order (key, value) iteration over the main DB."""
        if self.root == 0xFFFFFFFFFFFFFFFF:  # P_INVALID: empty db
            return
        yield from self._walk(self.root)

    def keys(self) -> Iterator[bytes]:
        """In-order key iteration WITHOUT materializing values.

        The reference's startup scan reads keys only
        (`/root/reference/dataset.py:24-30`); going through items() here
        would bytes()-copy every value (incl. overflow pages) — gigabytes
        for an LSUN-scale store — just to enumerate keys.
        """
        if self.root == 0xFFFFFFFFFFFFFFFF:
            return
        yield from self._walk_keys(self.root)

    def _walk_keys(self, pgno: int):
        off, flags, lower = self._page_header(pgno)
        n = self._num_keys(lower)
        if flags & P_LEAF:
            for i in range(n):
                _, _, _, _, key = self._node(off, i)
                yield key
        elif flags & P_BRANCH:
            for i in range(n):
                noff, _, _, _, _ = self._node(off, i)
                lo, hi, fl = struct.unpack_from("<HHH", self._mm, noff)
                child = lo | (hi << 16) | (fl << 32)
                yield from self._walk_keys(child)
        else:
            raise ValueError(f"unexpected page flags {flags:#x} at page {pgno}")

    def _walk(self, pgno: int):
        off, flags, lower = self._page_header(pgno)
        n = self._num_keys(lower)
        if flags & P_LEAF:
            for i in range(n):
                noff, nflags, ksize, dsize, key = self._node(off, i)
                yield key, self._leaf_value(noff, nflags, ksize, dsize)
        elif flags & P_BRANCH:
            # In branch nodes the lo/hi/flags fields overlap a 48-bit child
            # page number (mdb.c MDB_node mn_lo/mn_hi/mn_flags union).
            for i in range(n):
                noff, _, _, _, _ = self._node(off, i)
                lo, hi, fl = struct.unpack_from("<HHH", self._mm, noff)
                child = lo | (hi << 16) | (fl << 32)
                yield from self._walk(child)
        else:
            raise ValueError(f"unexpected page flags {flags:#x} at page {pgno}")

    def get(self, key: bytes) -> Optional[bytes]:
        """Point lookup by key (binary search down the B+tree)."""
        if self.root == 0xFFFFFFFFFFFFFFFF:
            return None
        pgno = self.root
        while True:
            off, flags, lower = self._page_header(pgno)
            n = self._num_keys(lower)
            if flags & P_LEAF:
                lo_i, hi_i = 0, n - 1
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) // 2
                    noff, nflags, ksize, dsize, k = self._node(off, mid)
                    if k == key:
                        return self._leaf_value(noff, nflags, ksize, dsize)
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                return None
            if not flags & P_BRANCH:
                raise ValueError(f"unexpected page flags {flags:#x}")
            # Branch: find rightmost child whose key <= target.
            chosen = 0
            lo_i, hi_i = 1, n - 1  # node 0 has empty key
            while lo_i <= hi_i:
                mid = (lo_i + hi_i) // 2
                _, _, _, _, k = self._node(off, mid)
                if k <= key:
                    chosen = mid
                    lo_i = mid + 1
                else:
                    hi_i = mid - 1
            noff, *_ = self._node(off, chosen)
            lo, hi, fl = struct.unpack_from("<HHH", self._mm, noff)
            pgno = lo | (hi << 16) | (fl << 32)
