#!/usr/bin/env python3
"""Deterministic mixture-of-Gaussians embedding fixtures for the
clustered-ANN scale law (SCALE.md round-19 measurement).

The driver's synthetic embeddings are ISOTROPIC — the adversarial case
where IVF recall is proportional to the probed fraction, pinning
knn_join_pq's sf1 ratio at ~48x. Real corpus embeddings are clustered;
this generates that case so the kCells ~ sqrt(n) / probed-fraction ~
1/sqrt(n) recipe can be MEASURED instead of asserted: fixed-size
clusters (~50 points) whose count grows linearly with n, centers on
the unit sphere, sigma=0.05 within-cluster noise (sigma*sqrt(d) = 0.4 well under the unit
center separation -- sigma=0.15 made sigma*sqrt(d)=1.2 swamp the centers
and the data quasi-isotropic).

Deterministic: numpy PCG64 with a fixed seed per scale; same schema as
the driver's embeddings.parquet (vec_id int64, embedding list<float>,
label int32 = the true cluster id mod 10).

Usage: python3 tools/make_clustered_embeddings.py [outRoot]
Writes <outRoot>/{n2000,n20000}/embeddings.parquet
(default outRoot: target/testdata/clustered)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/clustered"
D = 64
CLUSTER_SIZE = 50
SIGMA = 0.05

for n in (2000, 20000, 200000):
    rng = np.random.Generator(np.random.PCG64(20260816))
    c = n // CLUSTER_SIZE
    centers = rng.standard_normal((c, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.arange(n) % c                      # balanced clusters
    vecs = centers[assign] + SIGMA * rng.standard_normal((n, D))
    out_dir = os.path.join(OUT, f"n{n}")
    os.makedirs(out_dir, exist_ok=True)
    table = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(
            [row.astype(np.float32) for row in vecs],
            type=pa.list_(pa.float32())),
        "label": pa.array((assign % 10).astype(np.int32)),
    })
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    print(f"n{n}: {n} vectors, {c} true clusters, d={D} -> {out_dir}")
