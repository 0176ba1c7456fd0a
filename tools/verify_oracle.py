#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every registered probe: run the Spark plan and the DuckDB oracle on
the same sf dir, sort columns by name, canonicalize rows
(order-insensitive), and compare values exactly. Exit nonzero on any
mismatch. Run:  python tools/verify_oracle.py [sf_dir] [probe ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

from ark_invest_api_rust_data_spark.catalog import ALL_TABLES
from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.session import get_spark

# Per-oracle DuckDB wall cap (r11): con.interrupt() fires after this
# and the probe records a FAIL instead of wedging the sweep. The
# slowest legitimate oracle measured is the ~19-min all-pairs stage.
ORACLE_TIMEOUT_S = int(os.environ.get("ORACLE_TIMEOUT_S", "1800"))


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


class JcAmortizer:
    """Share the exhaustive all-pairs 3-gram Jaccard stage across the
    oracles that embed it (r10 judge item 2: at sf0.1 that stage is
    ~19 min and appears verbatim in 8 oracles — the sweep recomputed it
    8 times). With ``--amortize`` the stage is materialized ONCE as a
    DuckDB temp table whose defining query is ``LLM_MINHASH_SQL``
    byte-for-byte (the committed oracle of llm_minhash_lsh), and each
    consuming oracle's inner all-pairs block is rewritten to read it.

    Soundness: the table holds every pair with jc >= 0.5 plus the jc
    value computed by the IDENTICAL expression, so any downstream
    ``WHERE jc >= t`` with t >= 0.5 selects exactly the rows the
    self-contained SQL would — the rewrite refuses to fire unless it
    can see that guard (lookahead group) and the oracle's ``sh`` CTE
    is the 3-gram shingle text (LLM_NGRAM_SQL's 2-gram twin shares the
    inner block and must NOT be rewritten). The driver never sees any
    of this: `oracle_sql()` stays self-contained; this is a local
    sweep-cost optimization whose output is still hash-compared
    against the Spark engine row-for-row."""

    TABLE = "jc3_pairs"

    def __init__(self, con):
        import re

        from ark_invest_api_rust_data_spark.plans import llm as _llm

        self._con = con
        self._setup_sql = _llm.LLM_MINHASH_SQL
        self._sh3 = f"SELECT doc_id, {_llm._sql_shingles(3)} AS s"
        self._sh2 = f"SELECT doc_id, {_llm._sql_shingles(2)} AS s"
        self._built = False
        self.rewritten: list[str] = []
        # inner all-pairs block, with the jc threshold guard as a
        # lookahead so sub-0.5 consumers (none today) are left alone
        self._inner = re.compile(
            r"SELECT a\.doc_id AS doc_a, b\.doc_id AS doc_b,\s*"
            r"CAST\(len\(list_intersect\(a\.s, b\.s\)\) AS DOUBLE\)\s*"
            r"/ CAST\(len\(list_distinct\(a\.s \|\| b\.s\)\) AS DOUBLE\) AS jc\s*"
            r"FROM sh a JOIN sh b ON a\.doc_id < b\.doc_id"
            r"(?=\)\s*WHERE jc >= (0\.\d+))"
        )
        # llm_pair_overlap's variant: needs the shingle sets back, so
        # the rewrite joins jc3_pairs to sh on each side (O(pairs)
        # lookups instead of O(n^2) intersects)
        self._overlap = re.compile(
            r"SELECT a\.doc_id AS doc_a, b\.doc_id AS doc_b,"
            r" a\.s AS sa, b\.s AS sb\s*"
            r"FROM sh a JOIN sh b ON a\.doc_id < b\.doc_id\s*"
            r"WHERE CAST\(len\(list_intersect\(a\.s, b\.s\)\) AS DOUBLE\)\s*"
            r"/ CAST\(len\(list_distinct\(a\.s \|\| b\.s\)\) AS DOUBLE\)"
            r" >= (0\.\d+)"
        )

    def _ensure_table(self):
        if self._built:
            return
        t0 = time.time()
        # optional explicit cache (JC3_CACHE=<parquet path>): the
        # all-pairs stage is ~19 min at sf0.1, so sweep RESUMES after
        # a crash shouldn't pay it twice. Explicitly env-keyed — the
        # caller owns matching the cache file to the sf under test.
        cache = os.environ.get("JC3_CACHE")
        src = "built"
        if cache and os.path.exists(cache):
            self._con.execute(
                f"CREATE TEMP TABLE {self.TABLE} AS "
                f"SELECT * FROM '{cache}'"
            )
            src = f"loaded {cache}"
        else:
            self._con.execute(
                f"CREATE TEMP TABLE {self.TABLE} AS {self._setup_sql}"
            )
            if cache:
                self._con.execute(
                    f"COPY {self.TABLE} TO '{cache}' (FORMAT PARQUET)"
                )
                src = f"built + cached {cache}"
        n = self._con.execute(
            f"SELECT count(*) FROM {self.TABLE}"
        ).fetchone()[0]
        print(f"amortize: {src} {self.TABLE} ({n} pairs) "
              f"[{time.time() - t0:.1f}s]")
        self._built = True

    def rewrite(self, name: str, sql: str) -> str:
        if self._sh3 not in sql or self._sh2 in sql:
            return sql

        def _inner_repl(m):
            if float(m.group(1)) < 0.5:
                return m.group(0)
            return f"SELECT doc_a, doc_b, jc FROM {self.TABLE}"

        def _overlap_repl(m):
            if float(m.group(1)) < 0.5:
                return m.group(0)
            return (
                f"SELECT p.doc_a, p.doc_b, a.s AS sa, b.s AS sb\n"
                f"  FROM {self.TABLE} p JOIN sh a ON a.doc_id = p.doc_a\n"
                f"  JOIN sh b ON b.doc_id = p.doc_b\n"
                f"  WHERE p.jc >= {m.group(1)}"
            )

        new = self._inner.sub(_inner_repl, sql)
        new = self._overlap.sub(_overlap_repl, new)
        if new != sql:
            self._ensure_table()
            self.rewritten.append(name)
        return new


def main() -> int:
    import json

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    amortize = "--amortize" in argv
    if amortize:
        argv.remove("--amortize")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    amortizer = JcAmortizer(con) if amortize else None

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
        print(f"spark {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        t_spark = time.time() - t0
        try:
            import threading

            osql = probe.oracle
            if amortizer is not None:
                osql = amortizer.rewrite(name, osql)
            # watchdog (r11): a wedged single-threaded DuckDB section
            # would otherwise stall the whole sweep silently — interrupt
            # the query after the cap and record a FAIL instead
            dog = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
            dog.daemon = True
            dog.start()
            try:
                res = con.execute(osql)
            finally:
                dog.cancel()
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
    if amortizer is not None:
        print(f"amortized: {sorted(amortizer.rewritten)}")
    if json_path:
        summary = {
            "sf_dir": sf_dir,
            "n_ok": passed,
            "n_failed": len(failures),
            "n_rows_only": skipped,
            "probes": results,
        }
        if amortizer is not None:
            summary["amortized"] = sorted(amortizer.rewritten)
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
