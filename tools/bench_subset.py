#!/usr/bin/env python
"""Run a subset of the headline queries with bench.py's methodology
(per-query settle, two timed passes back-to-back, min kept, noop sink)
— the round-11 A/B instrument. Absolute numbers are only comparable
same-session/same-host; use against a baseline captured the same way.

Usage: python tools/bench_subset.py QUERY [QUERY ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_subset.py QUERY [QUERY ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bench-subset",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    probes = all_probes()
    # same untimed warmup as bench.py
    probes["b01_join_broadcast"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    probes["b07_agg_q1"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    for name in names:
        fn = probes[name].spark
        sc._jvm.System.gc()
        time.sleep(0.3)
        for _pass in range(2):
            sc.setJobGroup(f"{name}@p{_pass}", name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            sc.setJobGroup(None, None)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
        print(f"{name}: {timings[name]}", file=sys.stderr)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
