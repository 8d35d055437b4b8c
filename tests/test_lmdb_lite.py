"""LMDB file-format reader/writer (data/lmdb_lite.py).

The writer and reader are exercised against each other across every
structural regime of the format — inline leaves, overflow chains, multi-page
leaf levels, multi-level branch trees — plus direct byte-level assertions on
the meta pages (magic/version/psize/txnid selection) so a shared
misconception in the tree code could not silently pass the roundtrips.
"""

import os
import struct

import numpy as np
import pytest

from speech2affective_gestures_tpu.data import lmdb_lite


def _write_and_read(tmp_path, items, name="env", **kw):
    path = str(tmp_path / name)
    lmdb_lite.write_env(path, items, **kw)
    env = lmdb_lite.open(path, readonly=True, lock=False)
    with env.begin(write=False) as txn:
        got = list(txn.cursor())
    stat = env.stat()
    env.close()
    return got, stat


def test_roundtrip_inline(tmp_path):
    items = {b"beta": b"2" * 100, b"alpha": b"1" * 50, b"gamma": b"3"}
    got, stat = _write_and_read(tmp_path, items.items())
    assert got == sorted(items.items())  # memcmp key order
    assert stat["entries"] == 3
    assert stat["depth"] == 1
    assert stat["leaf_pages"] == 1
    assert stat["overflow_pages"] == 0


def test_overflow_values(tmp_path):
    rng = np.random.default_rng(0)
    # straddle the inline threshold: me_nodemax = 2038 for 4 KiB pages
    sizes = [1, 2000, 2039, 4096, 4081, 65537]
    items = [(b"%010d" % i, rng.integers(0, 256, size=s, dtype=np.uint8)
              .tobytes()) for i, s in enumerate(sizes)]
    got, stat = _write_and_read(tmp_path, items)
    assert got == items
    assert stat["entries"] == len(sizes)
    # OVPAGES(size) = (15 + size) // 4096 + 1 per spilled value
    big = [s for s in sizes if 8 + 10 + s > lmdb_lite._node_max(4096)]
    assert stat["overflow_pages"] == sum((15 + s) // 4096 + 1 for s in big)


def test_multi_leaf_and_branch_levels(tmp_path):
    # psize=512 forces a deep tree with modest key counts: ~12 leaf nodes
    # per page -> 50 leaves -> branch level(s) above
    items = [(b"%010d" % i, b"v" * 20) for i in range(600)]
    got, stat = _write_and_read(tmp_path, items, psize=512)
    assert got == items
    assert stat["depth"] >= 3
    assert stat["leaf_pages"] > 1
    assert stat["branch_pages"] >= 2


def test_get_and_empty_env(tmp_path):
    path = str(tmp_path / "env")
    lmdb_lite.write_env(path, [(b"k1", b"v1"), (b"k2", b"v2")])
    env = lmdb_lite.open(path)
    txn = env.begin()
    assert txn.get(b"k2") == b"v2"
    assert txn.get(b"missing") is None

    got, stat = _write_and_read(tmp_path, [], name="empty")
    assert got == []
    assert stat["entries"] == 0 and stat["depth"] == 0


def test_duplicate_key_rejected(tmp_path):
    with pytest.raises(lmdb_lite.LmdbFormatError):
        lmdb_lite.write_env(str(tmp_path / "dup"),
                            [(b"k", b"1"), (b"k", b"2")])


def test_meta_page_bytes(tmp_path):
    """Byte-level: magic/version at the documented offsets, psize stored in
    FREE_DBI.md_pad, and the live meta is the higher-txnid slot."""
    path = str(tmp_path / "env")
    data_path = lmdb_lite.write_env(path, [(b"k", b"v")])
    assert os.path.basename(data_path) == "data.mdb"
    raw = open(data_path, "rb").read()
    for slot in (0, 1):
        off = slot * 4096 + 16
        magic, version = struct.unpack_from("<II", raw, off)
        assert magic == 0xBEEFC0DE and version == 1
        (psize,) = struct.unpack_from("<I", raw, off + 24)  # FREE_DBI.md_pad
        assert psize == 4096
    # slot 0 = bootstrap txn 0 (empty main DB), slot 1 = committed txn 1
    txn0 = struct.unpack_from("<Q", raw, 16 + 24 + 96 + 8)[0]
    txn1 = struct.unpack_from("<Q", raw, 4096 + 16 + 24 + 96 + 8)[0]
    assert (txn0, txn1) == (0, 1)
    root0 = struct.unpack_from("<Q", raw, 16 + 24 + 48 + 40)[0]
    assert root0 == lmdb_lite.INVALID_PGNO  # slot 0 describes an empty DB


def test_write_env_rejects_bad_keys(tmp_path):
    with pytest.raises(lmdb_lite.LmdbFormatError):
        lmdb_lite.write_env(str(tmp_path / "e1"), [(b"", b"v")])
    with pytest.raises(lmdb_lite.LmdbFormatError):
        lmdb_lite.write_env(str(tmp_path / "e2"), [(b"k" * 3000, b"v")])


def test_readonly_surface(tmp_path):
    path = str(tmp_path / "env")
    lmdb_lite.write_env(path, [(b"k", b"v")])
    env = lmdb_lite.open(path)
    with pytest.raises(NotImplementedError):
        env.begin(write=True)
    with pytest.raises(NotImplementedError):
        lmdb_lite.Environment(path, readonly=False)
