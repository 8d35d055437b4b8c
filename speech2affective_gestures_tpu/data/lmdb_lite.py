"""Pure-python LMDB file-format reader/writer (no C dependency).

Why this exists: the original TED-db caches are LMDB environments written by
the reference's preprocessing (utils/data_preprocessor.py:163-178 opens them
with the `lmdb` C binding). This image — and many modern deployments — has no
`lmdb` module, which left the real-lmdb ingestion path (`ted_db.iter_lmdb_videos`)
permanently untestable. This module implements the LMDB *on-disk format*
itself (the stable `data.mdb` B-tree layout of LMDB 0.9.x, 64-bit, as
specified by upstream mdb.c struct layouts), so that:

  * reading a real TED `data.mdb` works with zero native dependencies
    (`ted_db` falls back to this module when `import lmdb` fails), and
  * tests can WRITE a genuine LMDB-format fixture and run the entire
    reference ingestion journey (lmdb -> pyarrow-0.14 blob -> preprocessing
    -> packed arrays) end to end in CI.

Format notes (struct layouts = mdb.c, 64-bit mdb_size_t build, the layout
the published TED caches use):

  page 0/1          meta pages: 16-byte page header (P_META) + MDB_meta
  MDB_meta          magic 0xBEEFC0DE, version 1, mapsize, MDB_db[2]
                    (FREE_DBI, MAIN_DBI), last_pg, txnid; the env page size
                    lives in FREE_DBI.md_pad (mm_psize), env flags in
                    FREE_DBI.md_flags
  MDB_db (48 B)     pad u32, flags u16, depth u16, branch/leaf/overflow
                    page counts u64, entries u64, root u64 (~0 = empty)
  data page         header: pgno u64, pad u16, flags u16, lower u16,
                    upper u16, then indx_t ptrs[] (sorted key order);
                    node bytes grow down from the page end
  MDB_node (8 B)    lo u16, hi u16, flags u16, ksize u16, then key bytes,
                    then (leaf) inline value or (F_BIGDATA) u64 overflow
                    pgno; branch nodes pack the 48-bit child pgno into
                    lo|hi<<16|flags<<32 and carry no value
  overflow chain    first page: header with flags=P_OVERFLOW and the u32
                    page count in the lower/upper slot; value bytes start
                    at offset 16 and run contiguously through the following
                    pages (which have NO headers)

The reader walks whichever meta page has the larger txnid — exactly
mdb_env_pick_meta. Only plain (non-DUPSORT, non-LEAF2) main-DB trees are
supported: that is what `pyarrow.serialize`-blob caches are.

The writer emits a complete fresh environment (meta0 = empty txn 0,
meta1 = the committed tree, txn 1), packing sorted items into leaves with
proper overflow spill (> me_nodemax = 2038 bytes for 4 KiB pages) and
building branch levels above them when more than one leaf is needed. Page
images it produces satisfy every structural invariant the reader (and
upstream mdb_page_search) relies on.

API: a small `lmdb`-binding-compatible shim — ``open()`` / ``Environment`` /
``Transaction.cursor()`` / ``Transaction.get()`` — covering exactly the
surface `ted_db.iter_lmdb_videos` and `tools/export_ted_cache.py` use.
"""

from __future__ import annotations

import builtins
import os
import struct
from typing import Iterable, Iterator

MAGIC = 0xBEEFC0DE
DATA_VERSION = 1

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20

F_BIGDATA = 0x01
F_SUBDATA = 0x02
F_DUPDATA = 0x04

PAGEHDRSZ = 16
NODESZ = 8
INVALID_PGNO = 0xFFFFFFFFFFFFFFFF

DEFAULT_PSIZE = 4096
DEFAULT_MAPSIZE = 10485760  # reference data_preprocessor map_size default

_PAGEHDR = struct.Struct("<QHHHH")  # pgno, pad, flags, lower, upper
_DB = struct.Struct("<IHHQQQQQ")  # pad, flags, depth, branch, leaf, ovf, entries, root
_META_HEAD = struct.Struct("<IIQQ")  # magic, version, address, mapsize
_META_TAIL = struct.Struct("<QQ")  # last_pg, txnid
_NODEHDR = struct.Struct("<HHHH")  # lo, hi, flags, ksize


def _even(n: int) -> int:
    return (n + 1) & ~1


def _node_max(psize: int) -> int:
    """mdb.c: me_nodemax = (((psize - PAGEHDRSZ) / MDB_MINKEYS) & -2)
    - sizeof(indx_t); values pushing a leaf node past this spill to
    overflow pages."""
    return (((psize - PAGEHDRSZ) // 2) & ~1) - 2


class _Db:
    __slots__ = ("pad", "flags", "depth", "branch_pages", "leaf_pages",
                 "overflow_pages", "entries", "root")

    def __init__(self, pad=0, flags=0, depth=0, branch_pages=0,
                 leaf_pages=0, overflow_pages=0, entries=0,
                 root=INVALID_PGNO):
        self.pad = pad
        self.flags = flags
        self.depth = depth
        self.branch_pages = branch_pages
        self.leaf_pages = leaf_pages
        self.overflow_pages = overflow_pages
        self.entries = entries
        self.root = root

    def pack(self) -> bytes:
        return _DB.pack(self.pad, self.flags, self.depth, self.branch_pages,
                        self.leaf_pages, self.overflow_pages, self.entries,
                        self.root)

    @classmethod
    def unpack(cls, buf: bytes, off: int) -> "_Db":
        vals = _DB.unpack_from(buf, off)
        return cls(*vals)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class LmdbFormatError(ValueError):
    pass


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        meta = self._pick_meta()
        self.psize = meta["psize"]
        self.main = meta["main"]
        self.last_pg = meta["last_pg"]

    def _read_meta(self, off: int) -> dict:
        buf = self.data
        magic, version, _addr, mapsize = _META_HEAD.unpack_from(
            buf, off + PAGEHDRSZ)
        if magic != MAGIC:
            raise LmdbFormatError(f"bad LMDB magic {magic:#x}")
        if version != DATA_VERSION:
            raise LmdbFormatError(f"unsupported LMDB data version {version}")
        dboff = off + PAGEHDRSZ + _META_HEAD.size
        free = _Db.unpack(buf, dboff)
        main = _Db.unpack(buf, dboff + _DB.size)
        last_pg, txnid = _META_TAIL.unpack_from(buf, dboff + 2 * _DB.size)
        psize = free.pad or DEFAULT_PSIZE  # mm_psize aliases FREE_DBI.md_pad
        return {"psize": psize, "mapsize": mapsize, "free": free,
                "main": main, "last_pg": last_pg, "txnid": txnid}

    def _pick_meta(self) -> dict:
        if len(self.data) < 2 * DEFAULT_PSIZE:
            # env psize could be < 4096 only on exotic platforms; meta1
            # offset needs the real psize, which meta0 carries
            if len(self.data) < PAGEHDRSZ + _META_HEAD.size:
                raise LmdbFormatError("file too small for an LMDB env")
        m0 = self._read_meta(0)
        m1 = self._read_meta(m0["psize"])
        return m1 if m1["txnid"] > m0["txnid"] else m0

    def _page(self, pgno: int):
        off = pgno * self.psize
        if off + PAGEHDRSZ > len(self.data):
            raise LmdbFormatError(f"page {pgno} beyond end of file")
        _pg, pad, flags, lower, upper = _PAGEHDR.unpack_from(self.data, off)
        return off, pad, flags, lower, upper

    def _node(self, page_off: int, ptr_idx: int):
        (ptr,) = struct.unpack_from("<H", self.data,
                                    page_off + PAGEHDRSZ + 2 * ptr_idx)
        noff = page_off + ptr
        lo, hi, flags, ksize = _NODEHDR.unpack_from(self.data, noff)
        key = self.data[noff + NODESZ:noff + NODESZ + ksize]
        return lo, hi, flags, key, noff + NODESZ + ksize

    def _overflow_value(self, pgno: int, size: int) -> bytes:
        off, _pad, flags, _lo, _up = self._page(pgno)
        if not flags & P_OVERFLOW:
            raise LmdbFormatError(f"page {pgno} is not an overflow page")
        start = off + PAGEHDRSZ
        if start + size > len(self.data):
            raise LmdbFormatError("overflow value runs past end of file")
        return self.data[start:start + size]

    def iter_tree(self, root: int) -> Iterator[tuple[bytes, bytes]]:
        if root == INVALID_PGNO:
            return
        off, _pad, flags, lower, upper = self._page(root)
        nkeys = (lower - PAGEHDRSZ) // 2
        if flags & P_LEAF2:
            raise LmdbFormatError("LEAF2 (DUPFIXED) pages unsupported")
        if flags & P_BRANCH:
            for i in range(nkeys):
                lo, hi, nflags, _key, _doff = self._node(off, i)
                child = lo | (hi << 16) | (nflags << 32)
                yield from self.iter_tree(child)
        elif flags & P_LEAF:
            for i in range(nkeys):
                lo, hi, nflags, key, doff = self._node(off, i)
                if nflags & (F_DUPDATA | F_SUBDATA):
                    raise LmdbFormatError("DUPSORT/sub-DB nodes unsupported")
                dsize = lo | (hi << 16)
                if nflags & F_BIGDATA:
                    (ovf_pgno,) = struct.unpack_from("<Q", self.data, doff)
                    yield key, self._overflow_value(ovf_pgno, dsize)
                else:
                    yield key, self.data[doff:doff + dsize]
        else:
            raise LmdbFormatError(
                f"page {root} has unexpected flags {flags:#x}")

    def items(self) -> Iterator[tuple[bytes, bytes]]:
        yield from self.iter_tree(self.main.root)

    def stat(self) -> dict:
        m = self.main
        return {"psize": self.psize, "depth": m.depth,
                "branch_pages": m.branch_pages, "leaf_pages": m.leaf_pages,
                "overflow_pages": m.overflow_pages, "entries": m.entries}


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _page_image(psize: int, pgno: int, flags: int,
                nodes: list[bytes]) -> bytes:
    """Assemble one branch/leaf page: ptrs ascending from PAGEHDRSZ, node
    bytes packed downward from the page end (sorted order, like a fresh
    mdb_page_fill). `nodes` are complete node byte strings in key order."""
    buf = bytearray(psize)
    ptrs = []
    top = psize
    for nb in nodes:
        top -= _even(len(nb))
        buf[top:top + len(nb)] = nb
        ptrs.append(top)
    lower = PAGEHDRSZ + 2 * len(nodes)
    upper = top
    if lower > upper:
        raise LmdbFormatError("page overflow: nodes exceed page capacity")
    _PAGEHDR.pack_into(buf, 0, pgno, 0, flags, lower, upper)
    for i, p in enumerate(ptrs):
        struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, p)
    return bytes(buf)


def _leaf_node(key: bytes, value: bytes, big: bool,
               ovf_pgno: int | None) -> bytes:
    dsize = len(value)
    hdr = _NODEHDR.pack(dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                        F_BIGDATA if big else 0, len(key))
    if big:
        return hdr + key + struct.pack("<Q", ovf_pgno)
    return hdr + key + value


def _branch_node(key: bytes, child_pgno: int) -> bytes:
    lo = child_pgno & 0xFFFF
    hi = (child_pgno >> 16) & 0xFFFF
    fl = (child_pgno >> 32) & 0xFFFF
    return _NODEHDR.pack(lo, hi, fl, len(key)) + key


def write_env(path: str, items: Iterable[tuple[bytes, bytes]],
              map_size: int = DEFAULT_MAPSIZE, subdir: bool = True,
              psize: int = DEFAULT_PSIZE) -> str:
    """Write a complete LMDB environment holding `items` in its main DB.

    Produces <path>/data.mdb (subdir=True, the binding's default layout)
    or <path> itself as the data file. Returns the data-file path. Items
    are sorted by key (memcmp order — LMDB's default comparator) and must
    have unique keys.
    """
    pairs = sorted(((bytes(k), bytes(v)) for k, v in items),
                   key=lambda kv: kv[0])
    for (a, _), (b, _) in zip(pairs, pairs[1:]):
        if a == b:
            raise LmdbFormatError(f"duplicate key {a!r}")
    node_max = _node_max(psize)
    max_key = node_max - NODESZ - 8  # mdb_env_get_maxkeysize analogue
    for k, _ in pairs:
        if len(k) == 0 or len(k) > max_key:
            raise LmdbFormatError(f"key size {len(k)} out of range")

    pages: dict[int, bytes] = {}
    next_pg = 2  # 0/1 are the meta pages

    def alloc(n: int = 1) -> int:
        nonlocal next_pg
        p = next_pg
        next_pg += n
        return p

    n_overflow = 0

    # 1. materialize leaf nodes, spilling big values to overflow chains
    leaf_nodes: list[tuple[bytes, bytes]] = []  # (key, node bytes)
    for k, v in pairs:
        inline_sz = NODESZ + len(k) + len(v)
        if inline_sz > node_max:
            n_ovf = (PAGEHDRSZ - 1 + len(v)) // psize + 1  # OVPAGES
            pg = alloc(n_ovf)
            n_overflow += n_ovf
            chain = bytearray(n_ovf * psize)
            hdr = bytearray(PAGEHDRSZ)
            # overflow header: lower/upper slot holds the u32 page count
            struct.pack_into("<QHHI", hdr, 0, pg, 0, P_OVERFLOW, n_ovf)
            chain[:PAGEHDRSZ] = hdr
            chain[PAGEHDRSZ:PAGEHDRSZ + len(v)] = v
            for j in range(n_ovf):
                pages[pg + j] = bytes(chain[j * psize:(j + 1) * psize])
            leaf_nodes.append((k, _leaf_node(k, v, True, pg)))
        else:
            leaf_nodes.append((k, _leaf_node(k, v, False, None)))

    # 2. pack nodes into leaf pages greedily (full pages are valid trees;
    #    fill factor only matters to writers)
    def pack_level(nodes: list[tuple[bytes, bytes]], flags: int):
        """-> list of (first_key, pgno) for the level above."""
        cap = psize - PAGEHDRSZ
        cost = [_even(len(nb)) + 2 for _, nb in nodes]
        groups: list[list[int]] = []
        cur: list[int] = []
        used = 0
        for i, c in enumerate(cost):
            if cur and used + c > cap:
                groups.append(cur)
                cur, used = [], 0
            cur.append(i)
            used += c
        if cur:
            groups.append(cur)
        # MDB_MINKEYS: a non-root branch page needs >= 2 nodes; steal one
        # from the previous (never-minimal after greedy fill) page
        if flags & P_BRANCH and len(groups) > 1 and len(groups[-1]) < 2:
            groups[-1].insert(0, groups[-2].pop())
        out = []
        for g in groups:
            pg = alloc()
            pages[pg] = _page_image(psize, pg, flags, [nodes[i][1] for i in g])
            out.append((nodes[g[0]][0], pg))
        return out

    depth = 0
    n_leaf = 0
    n_branch = 0
    entries = len(pairs)
    if not pairs:
        root = INVALID_PGNO
    else:
        level = pack_level(leaf_nodes, P_LEAF)
        n_leaf = len(level)
        depth = 1
        # 3. build branch levels until a single root remains
        while len(level) > 1:
            bnodes = []
            for i, (first_key, pg) in enumerate(level):
                # branch node 0 carries an empty key (lowest bound implicit)
                bnodes.append((first_key, _branch_node(
                    b"" if i == 0 else first_key, pg)))
            level = pack_level(bnodes, P_BRANCH)
            n_branch += len(level)
            depth += 1
        root = level[0][1]

    last_pg = next_pg - 1
    free_db = _Db(pad=psize, flags=0)  # md_pad doubles as mm_psize
    main_db = _Db(pad=0, flags=0, depth=depth, branch_pages=n_branch,
                  leaf_pages=n_leaf, overflow_pages=n_overflow,
                  entries=entries, root=root)
    map_size = max(map_size, (last_pg + 1) * psize)

    def meta_page(pgno: int, txnid: int, main: _Db) -> bytes:
        buf = bytearray(psize)
        _PAGEHDR.pack_into(buf, 0, pgno, 0, P_META, 0, 0)
        off = PAGEHDRSZ
        _META_HEAD.pack_into(buf, off, MAGIC, DATA_VERSION, 0, map_size)
        off += _META_HEAD.size
        buf[off:off + _DB.size] = free_db.pack()
        off += _DB.size
        buf[off:off + _DB.size] = main.pack()
        off += _DB.size
        _META_TAIL.pack_into(buf, off, last_pg, txnid)
        return bytes(buf)

    # meta0: the empty env bootstrap (txn 0); meta1: our committed txn 1 —
    # mdb_env_pick_meta takes the larger txnid
    pages[0] = meta_page(0, 0, _Db())
    pages[1] = meta_page(1, 1, main_db)

    if subdir:
        os.makedirs(path, exist_ok=True)
        data_path = os.path.join(path, "data.mdb")
    else:
        data_path = path
    with builtins.open(data_path, "wb") as f:
        for pg in range(last_pg + 1):
            f.write(pages.get(pg, b"\x00" * psize))
    return data_path


# ---------------------------------------------------------------------------
# `lmdb` binding API shim (the read surface ted_db/export tooling uses)
# ---------------------------------------------------------------------------

class _Cursor:
    def __init__(self, items: list[tuple[bytes, bytes]]):
        self._items = items

    def __iter__(self):
        return iter(self._items)

    def iternext(self, keys: bool = True, values: bool = True):
        if keys and values:
            return iter(self._items)
        if keys:
            return iter([k for k, _ in self._items])
        return iter([v for _, v in self._items])


class Transaction:
    def __init__(self, reader: _Reader):
        self._reader = reader
        self._items: list[tuple[bytes, bytes]] | None = None

    def _all(self) -> list[tuple[bytes, bytes]]:
        if self._items is None:
            self._items = list(self._reader.items())
        return self._items

    def cursor(self) -> _Cursor:
        return _Cursor(self._all())

    def get(self, key: bytes, default=None):
        for k, v in self._all():
            if k == key:
                return v
        return default

    def stat(self) -> dict:
        return self._reader.stat()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Environment:
    """Read-only `lmdb.Environment` lookalike over a data.mdb file."""

    def __init__(self, path: str, readonly: bool = True, lock: bool = False,
                 subdir: bool = True, **_ignored):
        if not readonly:
            raise NotImplementedError(
                "lmdb_lite environments are read-only; use write_env() to "
                "create fixtures/caches")
        data_path = os.path.join(path, "data.mdb") if subdir else path
        with builtins.open(data_path, "rb") as f:
            self._reader = _Reader(f.read())
        self.path_ = path

    def begin(self, write: bool = False, **_ignored) -> Transaction:
        if write:
            raise NotImplementedError("lmdb_lite is read-only")
        return Transaction(self._reader)

    def stat(self) -> dict:
        return self._reader.stat()

    def close(self):
        self._reader = None  # type: ignore[assignment]


def open(path: str, **kwargs) -> Environment:  # noqa: A001 - binding parity
    return Environment(path, **kwargs)
