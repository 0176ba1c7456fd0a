#!/usr/bin/env python
"""Capture .explain("formatted") for headline bench queries into
plans/<round>/<query>_<tag>.txt (optimization evidence: the judge
checks plan-shape claims against these files).

Usage:
  python tools/capture_plans.py TAG [QUERY ...]      # default: all HEADLINE
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    probes = all_probes()
    if not names:
        import bench

        names = bench.HEADLINE
    for name in names:
        try:
            df = probes[name].spark(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            txt = f"ERROR building plan: {e!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
