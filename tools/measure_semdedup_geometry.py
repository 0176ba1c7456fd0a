#!/usr/bin/env python
"""Coarse multi-probe SemDeDup recall/premium sweep on one embedding
corpus (r10 judge item 3).

Re-runs the finding-37 measurement — planted-near-dup recall and
candidate-pair premium of ``coarse_probe=2`` under the
``coarse_ratio2`` boundary gate — against any embeddings parquet, so
the near-uniform driver corpus (the adversarial ceiling: every vector
straddles) and a structured mixture-of-Gaussians fixture
(tools/make_planted_embeddings.py) can be recorded side by side.

Ground truth is exact cosine over the corpus (numpy, O(n^2·d) — fine
at fixture scale); recall counts globally-droppable ids recovered,
precision checks every drop has a true lower-id neighbor. The pair
premium re-derives the one-side-primary candidate count from
``two_level_assign`` memberships, identically to
tests/test_clustering.py's pair audit.

Usage: python tools/measure_semdedup_geometry.py <embeddings.parquet>
       [--label NAME] [--threshold 0.45] [--ratios 1.025,1.03,inf]
Prints one JSON line per corpus.
"""

from __future__ import annotations

import json
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, "/root/repo")

from ark_invest_api_rust_data_spark.operators.clustering import (
    semantic_dedup_scaled,
    two_level_assign,
)
from ark_invest_api_rust_data_spark.session import get_spark


def measure(path: str, threshold: float = 0.45, ratios=(1.025, 1.03, None)):
    spark = get_spark(app_name="semdedup-geometry")
    emb = spark.read.parquet(path).select("vec_id", "embedding")

    # ---- exact ground truth (same grid the engine verifies on:
    # floor(x * 1e6) int grid, then float cosine)
    rows = sorted(
        ((r["vec_id"], r["embedding"]) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    mat = np.floor(np.array([t[1] for t in rows], dtype=np.float64) * 1e6)
    norm = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.maximum(np.outer(norm, norm), 1e-12)
    np.fill_diagonal(cos, -1.0)
    # droppable: some LOWER-id row is a near-dup
    lower = np.tril(cos >= threshold, k=-1)
    gt_droppable = set(ids[lower.any(axis=1)].tolist())
    neighbor_ok = {
        int(ids[i]): set(ids[np.nonzero(lower[i])[0]].tolist())
        for i in range(len(ids))
        if lower[i].any()
    }

    n = len(ids)
    k = min(max(8, -(-n // 32)), 65536)

    def run_dedup(p, r):
        out = semantic_dedup_scaled(
            emb, target_cluster_size=32, iters=2, threshold=threshold,
            two_level_bound=1, coarse_probe=p, coarse_ratio2=r,
        ).collect()
        drops = {row["vec_id"] for row in out if not row["kept"]}
        false_drops = {d for d in drops if d not in gt_droppable}
        rec = len(drops & gt_droppable) / max(1, len(gt_droppable))
        return round(rec, 3), len(drops), len(false_drops)

    def pair_count(p, r):
        rows2 = two_level_assign(
            emb, k=k, iters=2, coarse_probe=p, coarse_ratio2=r
        ).collect()
        prim, sec = Counter(), Counter()
        n_sec = 0
        for row in rows2:
            if p == 1 or row["probe_rank"] == 1:
                prim[row["cluster"]] += 1
            else:
                sec[row["cluster"]] += 1
                n_sec += 1
        pairs = sum(
            c * (c - 1) // 2 + c * sec.get(cl, 0) for cl, c in prim.items()
        )
        return pairs, n_sec

    base_pairs, _ = pair_count(1, None)
    rec1, drops1, fd1 = run_dedup(1, None)
    out = {
        "corpus": path,
        "n": n,
        "k": k,
        "threshold": threshold,
        "gt_droppable": len(gt_droppable),
        "p1": {"recall": rec1, "drops": drops1, "false_drops": fd1,
               "pairs": base_pairs},
        "p2": {},
    }
    for r in ratios:
        pairs, n_sec = pair_count(2, r)
        rec, drops, fd = run_dedup(2, r)
        out["p2"][str(r)] = {
            "recall": rec,
            "drops": drops,
            "false_drops": fd,
            "pairs": pairs,
            "pair_premium": round(pairs / max(1, base_pairs), 2),
            "secondary_rate": round(n_sec / n, 3),
        }
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--label", default=None)
    ap.add_argument("--threshold", type=float, default=0.45)
    ap.add_argument("--ratios", default="1.025,1.03,inf")
    args = ap.parse_args()
    ratios = tuple(
        None if r in ("inf", "None") else float(r)
        for r in args.ratios.split(",")
    )
    res = measure(args.path, threshold=args.threshold, ratios=ratios)
    if args.label:
        res["label"] = args.label
    print(json.dumps(res))
