#!/usr/bin/env python
"""Same-session interleaved A/B of dedup._SIG_ARROW_BOUND (round 11,
second optimization session): alternates the interpreted MinHash
signature fold and the vectorized NumPy tier pass-by-pass inside ONE
session. min over reps per variant.

Usage: python tools/ab_sig_tier.py PROBE [PROBE ...] [--reps N]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ark_invest_api_rust_data_spark.operators import dedup as D
from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.session import get_spark

VARIANTS = [("expr", 1 << 30), ("arrow", 0)]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args.remove(str(reps))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab-sig-tier",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    probes = all_probes()
    probes["b01_join_broadcast"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    timings: dict[str, dict[str, float]] = {v: {} for v, _ in VARIANTS}
    for rep in range(reps):
        for name in args:
            fn = probes[name].spark
            for vname, bound in VARIANTS:
                D._SIG_ARROW_BOUND = bound
                sc._jvm.System.gc()
                time.sleep(0.3)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                elapsed = round(time.perf_counter() - t0, 3)
                cur = timings[vname].get(name)
                if cur is None or elapsed < cur:
                    timings[vname][name] = elapsed
                print(
                    f"rep{rep} {name} {vname}: {elapsed}", file=sys.stderr
                )
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
