#!/usr/bin/env python
"""Planted-cluster embedding fixture (r10 judge item 3).

The driver's synthetic embeddings are near-uniform on the sphere —
coarse d2/d1 median 1.03 (SCALE.md finding 37), so EVERY vector
straddles a coarse-cell boundary and the multi-probe recall/premium
dials measured there are the adversarial ceiling, not the typical
case. This tool writes a mixture-of-Gaussians corpus with real cluster
structure (long-tailed d2/d1) and PLANTED near-duplicates, so the same
sweep can be re-run on realistic geometry and the two numbers recorded
side by side:

- ``n_clusters`` unit-norm Gaussian centers; cluster sizes Zipf-tailed
  (real embedding corpora are head-heavy).
- In-cluster noise sigma sized so same-cluster cosine sits ~0.3 —
  BELOW the 0.45 near-dup threshold (membership alone is not
  duplication; only planted pairs are ground-truth dups).
- ``near_dup_frac`` of rows are eps-copies of an earlier row
  (cos ~0.999). A third of them copy a BOUNDARY base point placed at
  the midpoint of two centers — the straddler population coarse
  multi-probe exists for; the rest copy deep-in-cluster bases that
  p=1 already handles.

Schema matches the driver's embeddings.parquet exactly
(vec_id int64, embedding list<float32>, label int32), so every
embedding-consuming operator runs unmodified against the fixture.
Deterministic: seeded numpy Generator, no wall-clock anywhere.

CLI: python tools/make_planted_embeddings.py /tmp/planted.parquet
     [--n 2000] [--d 64] [--seed 7]
Prints a JSON line with the fixture's true-center d2/d1 percentiles
(computable here because the generator knows the centers; the
testdata corpus has no such ground truth).
"""

from __future__ import annotations

import json

import numpy as np


def make_planted(
    out_path: str,
    n: int = 2000,
    d: int = 64,
    n_clusters: int = 24,
    sigma: float = 0.19,
    near_dup_frac: float = 0.15,
    boundary_frac: float = 1 / 3,
    eps: float = 0.01,
    seed: int = 7,
) -> dict:
    """Write the fixture parquet; return generation stats (true-center
    d2/d1 percentiles, planted-pair counts) for the caller to record."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    zipf = 1.0 / np.arange(1, n_clusters + 1)
    zipf /= zipf.sum()

    n_dup = int(n * near_dup_frac)
    n_base = n - n_dup
    cl = rng.choice(n_clusters, size=n_base, p=zipf)
    base = centers[cl] + sigma * rng.standard_normal((n_base, d))

    # boundary bases: midpoint of the point's center and a random other
    # center (+ the same noise scale) — these sit where coarse cells
    # meet, so their eps-copies are exactly the pairs a cell-local
    # build can split
    n_bnd = int(n_base * near_dup_frac * boundary_frac)
    bnd_idx = rng.choice(n_base, size=n_bnd, replace=False)
    other = (cl[bnd_idx] + 1 + rng.integers(0, n_clusters - 1, n_bnd)) % n_clusters
    base[bnd_idx] = 0.5 * (centers[cl[bnd_idx]] + centers[other]) + (
        sigma * rng.standard_normal((n_bnd, d))
    )

    # planted dups: eps-copies of a random earlier base row; boundary
    # bases are oversampled so the straddler-dup population is real
    dup_of = np.concatenate(
        [
            rng.choice(bnd_idx, size=n_dup // 3),
            rng.choice(n_base, size=n_dup - n_dup // 3),
        ]
    )
    dups = base[dup_of] + eps * rng.standard_normal((n_dup, d))

    vecs = np.concatenate([base, dups]).astype(np.float32)
    labels = np.concatenate([cl, cl[dup_of]]).astype(np.int32)
    # interleave by shuffled vec_id so keep-first order is independent
    # of base-vs-dup generation order (dups may precede their base)
    perm = rng.permutation(n)
    vecs, labels = vecs[perm], labels[perm]

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels),
        }
    )
    pq.write_table(tbl, out_path)

    # true-center d2/d1 (squared-distance ratio would match the
    # engine's grid metric ordering; plain L2 ratio reported)
    dist = np.linalg.norm(vecs[:, None, :] - centers[None, :, :], axis=2)
    dist.sort(axis=1)
    ratio = dist[:, 1] / np.maximum(dist[:, 0], 1e-12)
    stats = {
        "n": n,
        "d": d,
        "n_clusters": n_clusters,
        "n_planted_dups": int(n_dup),
        "n_boundary_bases": int(n_bnd),
        "d2_d1": {
            p: round(float(np.percentile(ratio, q)), 3)
            for p, q in (("p10", 10), ("p50", 50), ("p90", 90))
        },
    }
    return stats


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    print(json.dumps(make_planted(args.out, n=args.n, d=args.d, seed=args.seed)))
