#!/usr/bin/env python
"""Scale audit: run the headline probes at every testdata scale factor
and measure how wall time and shuffle volume grow relative to input
size — the empirical "would this survive 100×?" evidence behind
SCALE.md. Usage:

    python tools/scale_audit.py [out.json]

Method: one session, untimed warmup per scale (parquet footers +
codegen), two timed passes per (probe, sf), min kept (steady-state;
see bench.py for why min-of-2 is honest now that operators release
their caches). Shuffle bytes via the status REST API per job group.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, shuffle_bytes_by_group  # noqa: E402
from ark_invest_api_rust_data_spark.plans import all_probes  # noqa: E402
from ark_invest_api_rust_data_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
EXTRA = [
    "llm_ngram_jaccard",
    "llm_repetition",
    "b21_hypertable_rollup",
    "llm_vocab_topk",
    "llm_tfidf_topterms",
    "llm_knn_join",
    "llm_corpus_pipeline",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_audit.json"
    spark = get_spark(
        app_name="scale_audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    sc = spark.sparkContext
    probes = all_probes()
    names = HEADLINE + EXTRA

    results: dict[str, dict[str, dict]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        # warmup: footers + codegen for this scale's files
        probes["b07_agg_q1"].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for _pass in range(2):
            for name in names:
                sc.setJobGroup(f"{name}@sf{sf}@p{_pass}", name)
                t0 = time.perf_counter()
                probes[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                elapsed = round(time.perf_counter() - t0, 3)
                sc.setJobGroup(None, None)
                cur = results.setdefault(name, {}).setdefault(sf, {"sec": elapsed})
                cur["sec"] = min(cur["sec"], elapsed)

    by_group = shuffle_bytes_by_group(spark)
    for name in names:
        for sf in SFS:
            g = by_group.get(f"{name}@sf{sf}@p1") or by_group.get(f"{name}@sf{sf}@p0")
            if g:
                results[name][sf]["shuffle_read"] = g["read"]

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"probes": len(results), "out": out_path}))


if __name__ == "__main__":
    main()
