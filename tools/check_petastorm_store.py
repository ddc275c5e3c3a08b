#!/usr/bin/env python3
"""Prove a graft `materializePetastorm` store opens in UNMODIFIED
petastorm: unpickle the Unischema from _common_metadata with the
reference's own classes, read the row-group metadata the reference's
load_row_groups wants, and decode tensor cells with petastorm's own
NdarrayCodec (np.load). The petastorm package __init__ needs a
pre-modern pyarrow, so submodules are imported directly (their code
is exactly what make_reader's schema/decode path executes).

Usage: python3 tools/check_petastorm_store.py <store_dir> [reference_dir]
"""
import glob
import json
import pickle
import sys
import types

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

store = sys.argv[1]
ref = sys.argv[2] if len(sys.argv) > 2 else "/root/reference"

pkg = types.ModuleType("petastorm")
pkg.__path__ = [ref + "/petastorm"]
sys.modules["petastorm"] = pkg
dc = types.ModuleType("diskcache")
dc.FanoutCache = object
sys.modules["diskcache"] = dc

md = pq.read_metadata(store + "/_common_metadata")
kv = md.metadata
assert b"dataset-toolkit.unischema.v1" in kv, "unischema key missing"
assert b"dataset-toolkit.num_row_groups_per_file.v1" in kv, "row-groups key missing"

# get_schema (dataset_metadata.py:356-386): unpickle with the
# reference's petastorm.unischema / petastorm.codecs classes
schema = pickle.loads(kv[b"dataset-toolkit.unischema.v1"])
assert type(schema).__module__ == "petastorm.unischema", type(schema)
print(f"unischema: {schema._name} fields={list(schema._fields.keys())}")

# load_row_groups (:244-273)
rg = json.loads(kv[b"dataset-toolkit.num_row_groups_per_file.v1"].decode())
files = sorted(glob.glob(store + "/part-*.parquet"))
assert set(rg.keys()) == {f.split("/")[-1] for f in files}, (rg, files)
print(f"row groups: {rg}")

# decode every codec'd cell of every row with petastorm's OWN codecs
d = pd.concat([pd.read_parquet(f) for f in files]).reset_index(drop=True)
n_decoded = 0
for name, field in schema._fields.items():
    codec = field.codec
    if codec is None or type(codec).__name__ == "ScalarCodec":
        continue
    if type(codec).__name__ == "CompressedImageCodec":
        # cv2 is not installed here; assert genuine image bytes instead
        magic = b"\x89PNG\r\n\x1a\n" if codec._image_codec == ".png" else b"\xff\xd8"
        for v in d[name]:
            assert bytes(v[: len(magic)]) == magic, f"{name}: not {codec._image_codec}"
            n_decoded += 1
        continue
    for v in d[name]:
        arr = codec.decode(field, v)  # petastorm NdarrayCodec = np.load
        assert arr.dtype == np.dtype(field.numpy_dtype), (arr.dtype, field.numpy_dtype)
        assert tuple(arr.shape) == tuple(field.shape), (arr.shape, field.shape)
        n_decoded += 1
print(f"decoded {n_decoded} cells with petastorm's own codecs: OK")
print("PASS")
