#!/usr/bin/env python
"""Per-probe profiler (round 11, guide §1): time one probe to the noop
sink and break the wall down into its constituent Spark jobs/stages via
the status REST API, so optimization targets the real cost (driver
round-trips? one slow stage? many tiny jobs?) instead of a guess.

Usage:
  python tools/profile_probe.py PROBE [PROBE...] [--sf DIR] [--passes N]
         [--explain]

Per probe prints: wall per pass, job count, total job time, the slowest
jobs with their stage breakdown (executor run time vs task count), and
optionally the formatted plan.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.session import get_spark


def rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=60) as r:
        return json.load(r)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
        args.remove(sf_dir)
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
        args.remove(str(passes))
    want_explain = "--explain" in sys.argv

    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    probes = all_probes()
    # warmup (session cold start: codegen, executor spin-up)
    probes["b01_join_broadcast"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    base = sc.uiWebUrl
    app_id = sc.applicationId

    for name in args:
        fn = probes[name].spark
        if want_explain:
            df = fn(spark, sf_dir)
            print(f"===== {name} PLAN =====")
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        sc._jvm.System.gc()
        time.sleep(0.3)
        walls = []
        for p in range(passes):
            group = f"prof:{name}@{p}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
        # analyze the LAST pass (steady state)
        jobs = rest(base, f"/api/v1/applications/{app_id}/jobs?status=succeeded")
        stages = rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
        st_by_id = {}
        for s in stages:
            st_by_id.setdefault(s["stageId"], s)
        gjobs = [j for j in jobs if j.get("jobGroup") == f"prof:{name}@{passes-1}"]
        gjobs.sort(key=lambda j: j["jobId"])
        total_job_ms = 0.0
        rows = []
        for j in gjobs:
            t_sub = j["submissionTime"]
            t_end = j.get("completionTime")
            from datetime import datetime

            def ts(x):
                return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

            dur = (ts(t_end) - ts(t_sub)) * 1000 if t_end else -1
            total_job_ms += max(dur, 0)
            sdesc = []
            for sid in j.get("stageIds", []):
                s = st_by_id.get(sid)
                if not s:
                    continue
                sdesc.append(
                    f"s{sid}:{s['numCompleteTasks']}t/"
                    f"{s.get('executorRunTime',0)}ms"
                    + (f"/shR{s.get('shuffleReadBytes',0)//1024}K"
                       if s.get('shuffleReadBytes') else "")
                )
            rows.append((dur, j["jobId"], j.get("description") or "", sdesc))
        print(f"===== {name} =====")
        print(f"walls: {[round(w,3) for w in walls]}  jobs(last pass): "
              f"{len(gjobs)}  sum(job_ms): {total_job_ms:.0f}")
        for dur, jid, desc, sdesc in sorted(rows, key=lambda r: -r[0])[:12]:
            print(f"  job {jid}: {dur:7.0f} ms  {' '.join(sdesc)[:140]}")
        gap = walls[-1] * 1000 - total_job_ms
        print(f"  driver/gap time (wall - sum jobs): {gap:.0f} ms")


if __name__ == "__main__":
    main()
