#!/usr/bin/env python3
"""Independent byte-compatibility check of the on-disk chunk format:
decode a chunk written by the engine using only gzip+numpy and verify
column-major (Fortran, x-fastest) little-endian layout against the
engine's own voxel values dumped via Verify-style parquet.

Usage: run after `sbt 'runMain graft.tools.ByteCompatDump <dir>'`.
"""
import gzip, json, sys
import numpy as np
import duckdb

d = sys.argv[1]
info = json.load(open(f"{d}/info"))
scale = info["scales"][0]
sx, sy, sz = scale["chunk_sizes"][0]
dt = {"uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32,
      "uint64": np.uint64, "float32": np.float32, "float64": np.float64}[info["data_type"]]
key = scale["key"]
blob = open(f"{d}/{key}/0-{sx}_0-{sy}_0-{sz}", "rb").read()
raw = gzip.decompress(blob)
# column-major: x fastest => reshape with order='F'
arr = np.frombuffer(raw, dtype=np.dtype(dt).newbyteorder("<")).reshape((sx, sy, sz), order="F")
vox = duckdb.sql(f"SELECT x, y, z, value FROM '{d}/voxels.parquet/*.parquet' ORDER BY z, y, x").fetchall()
bad = 0
for (x, y, z, v) in vox:
    if int(arr[x-1, y-1, z-1]) != int(v):
        bad += 1
        if bad < 5:
            print(f"mismatch at ({x},{y},{z}): numpy={arr[x-1,y-1,z-1]} engine={v}")
print("checked", len(vox), "voxels;", "OK" if bad == 0 else f"{bad} MISMATCHES")
sys.exit(1 if bad else 0)
