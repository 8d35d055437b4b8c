#!/usr/bin/env python
"""Export the original TED-db lmdb caches to a portable, lmdb-free archive.

The TED Gesture DB ships as lmdb environments whose records were written
with pyarrow 0.14.0's legacy ``serialize`` API (reference
utils/data_preprocessor.py:175-178, requirements.txt pins pyarrow==0.14.0).
Modern pyarrow cannot ``deserialize`` them, and lmdb is often unavailable.
This script converts each split ONCE into gzip'd pickle shards (plain
python + numpy only) that speech2affective_gestures_tpu ingests anywhere
via ``ted_db.load_exported_data`` / ``main_v2.py --packed-data``.

It is self-contained and python-3.7-compatible on purpose: run it either

  (a) inside the reference's pinned environment (python 3.7, pyarrow==0.14,
      lmdb) — decoding uses pyarrow.deserialize directly; or
  (b) in any modern environment with lmdb — decoding falls back to the
      pure-python legacy reader (data/legacy_arrow.py, loaded by file path
      so no package deps are pulled in).

Two-command recipe:

  python tools/export_ted_cache.py --lmdb-base <dir with ted_dataset_*> \
      --out exported/ --level raw
  python -m speech2affective_gestures_tpu.main_v2 -b BASE -c CONFIG \
      --packed-data exported/

Levels:
  raw    export the original ted_dataset_{train,val,test} video records
         (dict with 'vid' + 'clips'); the TPU framework then runs its own
         windowing/filter/MFCC preprocessing.
  cache  export the reference's preprocessed *_s2ag_v2_cache_mfcc_N sample
         records ([words, poses, dir_vec, audio, spectrogram, mfcc, aux],
         loader_v2.py:489-505); the TPU framework only packs them.
"""

from __future__ import print_function

import argparse
import gzip
import importlib.util
import json
import os
import pickle
import sys


RAW_DIRS = {
    "train": "ted_dataset_train",
    "val": "ted_dataset_val",
    "test": "ted_dataset_test",
}


def make_decoder():
    try:
        import pyarrow

        if hasattr(pyarrow, "deserialize"):
            return pyarrow.deserialize
    except ImportError:
        pass
    # modern pyarrow: load the pure-python legacy reader by file path
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(
        here, "..", "speech2affective_gestures_tpu", "data", "legacy_arrow.py"
    )
    spec = importlib.util.spec_from_file_location("_legacy_arrow", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.deserialize


def iter_lmdb_records(lmdb_dir, decode):
    try:
        import lmdb
    except ImportError:
        # pure-python LMDB file-format reader fallback, loaded by file
        # path (this tool runs standalone in foreign envs, like the
        # legacy_arrow loader above)
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(here, "..", "speech2affective_gestures_tpu",
                            "data", "lmdb_lite.py")
        spec = importlib.util.spec_from_file_location("_lmdb_lite", path)
        lmdb = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(lmdb)

    env = lmdb.open(lmdb_dir, readonly=True, lock=False)
    try:
        with env.begin(write=False) as txn:
            for _key, value in txn.cursor():
                yield decode(value)
    finally:
        env.close()


def export_split(lmdb_dir, out_dir, split, shard_size, decode):
    shard, count, n_shards = [], 0, 0

    def write_shard(records, idx):
        path = os.path.join(out_dir, "{}_{:04d}.pkl.gz".format(split, idx))
        with gzip.open(path, "wb", compresslevel=4) as f:
            pickle.dump(records, f, protocol=4)

    for record in iter_lmdb_records(lmdb_dir, decode):
        shard.append(record)
        count += 1
        if len(shard) >= shard_size:
            write_shard(shard, n_shards)
            n_shards += 1
            shard = []
            print("  {}: {} records, {} shards".format(split, count, n_shards))
    if shard:
        write_shard(shard, n_shards)
        n_shards += 1
    return {"shards": n_shards, "records": count}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--lmdb-base", required=True,
                   help="directory containing the per-split lmdb dirs")
    p.add_argument("--out", required=True, help="output archive directory")
    p.add_argument("--level", choices=("raw", "cache"), default="raw")
    p.add_argument("--splits", default="train,val,test")
    p.add_argument("--num-mfcc", type=int, default=14,
                   help="cache-level lmdb dir suffix (loader_v2.py:489-498)")
    p.add_argument("--shard-size", type=int, default=64,
                   help="records per shard (raw videos are large; "
                        "cache samples small — use ~4096 for cache level)")
    args = p.parse_args(argv)

    decode = make_decoder()
    os.makedirs(args.out, exist_ok=True)
    manifest = {"level": args.level, "num_mfcc": args.num_mfcc, "splits": {}}
    for split in args.splits.split(","):
        split = split.strip()
        if args.level == "raw":
            lmdb_dir = os.path.join(args.lmdb_base, RAW_DIRS[split])
        else:
            lmdb_dir = os.path.join(
                args.lmdb_base,
                RAW_DIRS[split] + "_s2ag_v2_cache_mfcc_{}".format(args.num_mfcc),
            )
        if not os.path.isdir(lmdb_dir):
            print("skipping {}: {} not found".format(split, lmdb_dir))
            continue
        print("exporting {} from {}".format(split, lmdb_dir))
        manifest["splits"][split] = export_split(
            lmdb_dir, args.out, split, args.shard_size, decode
        )
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print("wrote {}".format(os.path.join(args.out, "manifest.json")))


if __name__ == "__main__":
    sys.exit(main())
