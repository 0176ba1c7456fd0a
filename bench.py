#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Queries execute to a noop sink — full pipeline runs (scan→shuffle→agg),
nothing materializes on the driver, so the number is engine time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.session import get_spark

# Headline set: the shuffling/joining/window-heavy relational core plus
# the LLM ops that matter for training-data pipelines.
HEADLINE = [
    "b02_star_join",
    "b02_q3_shipping_priority",
    "b03_full_outer",
    "b05_theta_join",
    "b06_asof_join",
    "b07_agg_q1",
    "b08_percentile",
    "b11_window_rank",
    "b12_window_running",
    "b13_topk",
    "b21_window_tumbling",
    "b22_sessionize",
    "llm_text_stats",
    "llm_simhash",
    "llm_minhash_lsh",
    "llm_fingerprint",
    "llm_similarity_topk",
    "llm_embedding_near_dup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    probes = all_probes()
    # untimed warmup: parquet footers, codegen, executor spin-up — so
    # per-query numbers measure the query, not session cold start
    probes["b01_join_broadcast"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    probes["b07_agg_q1"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # two passes, report the min: pass 1 pays one-time whole-stage-
    # codegen compilation (~5s for the largest expression trees), which
    # at real scale amortizes to nothing — steady-state is the honest
    # per-query engine time
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn = probes[name].spark
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
