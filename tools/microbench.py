"""Micro-bench a few probes with bench.py's settle + min-of-2
methodology — for iterating on a single query's plan without the full
headline run.  Usage: python tools/microbench.py probe [probe...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ark_invest_api_rust_data_spark.plans import all_probes  # noqa: E402
from ark_invest_api_rust_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: microbench.py probe [probe...]")
    spark = get_spark(app_name="microbench")
    probes = all_probes()
    probes["b01_join_broadcast"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        spark._jvm.System.gc()
        time.sleep(0.3)
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            probes[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
