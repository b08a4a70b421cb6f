"""Minimal LMDB writer for test fixtures: meta pages + one leaf whose
values live on overflow pages (the layout LSUN-style image stores hit in
practice). Only what the read-only reader needs; not a general writer."""

import struct

PSIZE = 4096
MAGIC = 0xBEEFC0DE
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
F_BIGDATA = 0x01


def _meta_page(pgno, txnid, root, entries, last_pg):
    page = bytearray(PSIZE)
    struct.pack_into("<Q", page, 0, pgno)
    struct.pack_into("<H", page, 10, P_META)
    base = 16
    struct.pack_into("<II", page, base, MAGIC, 999)
    struct.pack_into("<Q", page, base + 16, PSIZE * 4096)
    struct.pack_into("<I", page, base + 24, PSIZE)  # free db md_pad = psize
    struct.pack_into("<Q", page, base + 24 + 40, 0xFFFFFFFFFFFFFFFF)
    main = base + 24 + 48
    struct.pack_into("<Q", page, main + 32, entries)
    struct.pack_into("<Q", page, main + 40, root)
    struct.pack_into("<Q", page, base + 24 + 96, last_pg)
    struct.pack_into("<Q", page, base + 24 + 96 + 8, txnid)
    return bytes(page)


def write_lmdb(path, items):
    """items: sorted list of (key bytes, value bytes); values go to
    overflow pages. Writes <path>/data.mdb."""
    import os

    os.makedirs(path, exist_ok=True)
    overflow_pages = []
    next_pg = 3  # 0,1 meta; 2 leaf
    node_meta = []
    for key, val in items:
        n_pages = -(-(len(val)) // (PSIZE - 16))
        node_meta.append((key, len(val), next_pg))
        page = bytearray(PSIZE * n_pages)
        struct.pack_into("<Q", page, 0, next_pg)
        struct.pack_into("<H", page, 10, P_OVERFLOW)
        struct.pack_into("<I", page, 12, n_pages)  # mp_pages
        page[16 : 16 + len(val)] = val
        overflow_pages.append(bytes(page))
        next_pg += n_pages

    leaf = bytearray(PSIZE)
    struct.pack_into("<Q", leaf, 0, 2)
    struct.pack_into("<H", leaf, 10, P_LEAF)
    n = len(items)
    lower = 16 + 2 * n
    upper = PSIZE
    ptrs = []
    for key, vlen, ovpg in reversed(node_meta):
        node_size = 8 + len(key) + 8
        node_size += node_size & 1
        upper -= node_size
        struct.pack_into("<HHHH", leaf, upper,
                         vlen & 0xFFFF, (vlen >> 16) & 0xFFFF,
                         F_BIGDATA, len(key))
        leaf[upper + 8 : upper + 8 + len(key)] = key
        struct.pack_into("<Q", leaf, upper + 8 + len(key), ovpg)
        ptrs.append(upper)
    ptrs.reverse()
    for i, ptr in enumerate(ptrs):
        struct.pack_into("<H", leaf, 16 + 2 * i, ptr)
    struct.pack_into("<HH", leaf, 12, lower, upper)

    data = (
        _meta_page(0, 1, 2, n, next_pg - 1)
        + _meta_page(1, 2, 2, n, next_pg - 1)
        + bytes(leaf)
        + b"".join(overflow_pages)
    )
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(data)
