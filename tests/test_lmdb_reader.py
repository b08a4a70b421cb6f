"""LMDB reader test against a hand-crafted minimal data.mdb fixture
(meta pages + one leaf page, 4096-byte pages, the format the pure-Python
reader implements)."""

import struct

import numpy as np
import pytest

from ideas_tpu.data.lmdb_reader import LMDBReader

PSIZE = 4096
MAGIC = 0xBEEFC0DE
P_LEAF = 0x02
P_META = 0x08


def _meta_page(pgno, txnid, root, entries, psize=PSIZE):
    page = bytearray(psize)
    struct.pack_into("<Q", page, 0, pgno)          # mp_pgno
    struct.pack_into("<H", page, 10, P_META)       # flags
    base = 16
    struct.pack_into("<II", page, base, MAGIC, 999)        # magic, version
    struct.pack_into("<Q", page, base + 8, 0)              # address
    struct.pack_into("<Q", page, base + 16, psize * 16)    # mapsize
    # mm_dbs[0] (free db): md_pad = page size
    struct.pack_into("<I", page, base + 24, psize)
    struct.pack_into("<Q", page, base + 24 + 40, 0xFFFFFFFFFFFFFFFF)
    # mm_dbs[1] (main db)
    main = base + 24 + 48
    struct.pack_into("<Q", page, main + 32, entries)       # md_entries
    struct.pack_into("<Q", page, main + 40, root)          # md_root
    struct.pack_into("<Q", page, base + 24 + 96, 2)        # last_pg
    struct.pack_into("<Q", page, base + 24 + 96 + 8, txnid)
    return bytes(page)


def _leaf_page(pgno, items, psize=PSIZE):
    """items: list of (key bytes, value bytes), pre-sorted."""
    page = bytearray(psize)
    struct.pack_into("<Q", page, 0, pgno)
    struct.pack_into("<H", page, 10, P_LEAF)
    n = len(items)
    lower = 16 + 2 * n
    upper = psize
    ptrs = []
    for key, val in reversed(items):
        node_size = 8 + len(key) + len(val)
        node_size += node_size & 1  # even alignment
        upper -= node_size
        noff = upper
        struct.pack_into("<HHHH", page, noff,
                         len(val) & 0xFFFF, (len(val) >> 16) & 0xFFFF,
                         0, len(key))
        page[noff + 8 : noff + 8 + len(key)] = key
        page[noff + 8 + len(key) : noff + 8 + len(key) + len(val)] = val
        ptrs.append(noff)
    ptrs.reverse()
    for i, ptr in enumerate(ptrs):
        struct.pack_into("<H", page, 16 + 2 * i, ptr)
    struct.pack_into("<HH", page, 12, lower, upper)
    return bytes(page)


@pytest.fixture
def tiny_lmdb(tmp_path):
    items = [(f"k{i:03d}".encode(), f"value-{i}".encode() * (i + 1))
             for i in range(5)]
    data = (
        _meta_page(0, txnid=1, root=2, entries=len(items))
        + _meta_page(1, txnid=2, root=2, entries=len(items))
        + _leaf_page(2, items)
    )
    p = tmp_path / "data.mdb"
    p.write_bytes(data)
    return str(tmp_path), items


def test_items_iteration(tiny_lmdb):
    path, items = tiny_lmdb
    db = LMDBReader(path)
    assert db.entries == len(items)
    got = list(db.items())
    assert got == items


def test_point_lookup(tiny_lmdb):
    path, items = tiny_lmdb
    db = LMDBReader(path)
    for k, v in items:
        assert db.get(k) == v
    assert db.get(b"missing") is None
