#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every registered probe: run the Spark plan and the DuckDB oracle on
the same sf dir, sort columns by name, canonicalize rows
(order-insensitive), and compare values exactly. Exit nonzero on any
mismatch. Run:  python tools/verify_oracle.py [sf_dir] [probe ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

from ark_invest_api_rust_data_spark.catalog import ALL_TABLES
from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.session import get_spark


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exactness is the point
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main() -> int:
    import json

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    probes = all_probes()
    failures, passed, skipped = [], 0, 0
    results: dict[str, dict] = {}
    for name, probe in probes.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = probe.spark(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            results[name] = {"status": "fail", "err": f"spark error: {e}"[:300]}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if probe.oracle is None:
            skipped += 1
            results[name] = {"status": "rows_only", "rows": len(srows)}
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(probe.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            results[name] = {"status": "fail", "err": f"duckdb error: {e}"[:300]}
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema: spark={sorted(scols)} oracle={sorted(ocols)}"))
            results[name] = {"status": "fail", "err": "schema mismatch"}
            print(f"FAIL  {name}: schema mismatch spark={sorted(scols)} duck={sorted(ocols)}")
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if len(cs) != len(co):
            failures.append((name, f"rowcount spark={len(cs)} oracle={len(co)}"))
            results[name] = {"status": "fail", "err": f"rowcount spark={len(cs)} oracle={len(co)}"}
            print(f"FAIL  {name}: rowcount spark={len(cs)} duck={len(co)}")
            continue
        if cs != co:
            diff = next(i for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            failures.append((name, f"values differ at sorted row {diff}"))
            results[name] = {"status": "fail", "err": f"values differ at sorted row {diff}"}
            print(f"FAIL  {name}: values differ; first diff at sorted row {diff}:")
            print(f"      cols(sorted): {sorted(scols)}")
            print(f"      spark: {cs[diff]}")
            print(f"      duck : {co[diff]}")
            continue
        passed += 1
        results[name] = {
            "status": "ok",
            "rows": len(cs),
            "secs": round(time.time() - t0, 2),
        }
        print(f"ok    {name}: {len(cs)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{passed} ok, {len(failures)} failed, {skipped} rows-only")
    if json_path:
        summary = {
            "sf_dir": sf_dir,
            "n_ok": passed,
            "n_failed": len(failures),
            "n_rows_only": skipped,
            "probes": results,
        }
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
