#!/usr/bin/env python
"""A/B the kmeans_fit execution tiers (expr fold vs Arrow/NumPy) at the
probe scales (k*dim = 512..4096), on this host (round 11, guide §1).
The tiers are bit-identical (pytest-pinned); this measures which should
be the default below the current _ARROW_ASSIGN_BOUND.

Run: python tools/ab_kmeans_tier.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ark_invest_api_rust_data_spark.catalog import load_table
from ark_invest_api_rust_data_spark.operators.clustering import kmeans_fit
from ark_invest_api_rust_data_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-kmeans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    emb = load_table(spark, sf_dir, "embeddings")
    emb.write.format("noop").mode("overwrite").save()  # warm scan

    for k in (8, 16, 64):
        for arrow in (False, True):
            for _pass in range(2):
                t0 = time.perf_counter()
                cents, asg = kmeans_fit(emb, k=k, iters=3, arrow=arrow)
                asg.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
            print(
                f"k={k:3d} dim=64 k*dim={k*64:5d} arrow={arrow}: "
                f"{dt:.3f}s (steady pass)"
            )
            # free the returned localCheckpoint blocks
            try:
                asg._jdf.logicalPlan().rdd().unpersist(False)
            except Exception:
                pass


if __name__ == "__main__":
    main()
