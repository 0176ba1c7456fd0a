"""CLI — the SURVEY §7 M1 gate plus operational entry points.

  python -m ark_invest_api_rust_data_spark demo
      bundled ARK-shaped fixture → normalize → local parquet lake →
      "latest holdings by weight" (the product query the reference's
      cache serves to its REST API).
  python -m ark_invest_api_rust_data_spark refresh --ticker ARKK [...]
      one ticker's incremental refresh (live HTTP).
  python -m ark_invest_api_rust_data_spark backfill --ticker ARKK
      CSV-directory backfill (O2/STARTUP_CSV_MERGE).
  python -m ark_invest_api_rust_data_spark scheduled-run
      the twice-daily fan-out over the 8 scheduled tickers (O3/O5).
"""

from __future__ import annotations

import argparse
import sys
import tempfile

import pyspark.sql.functions as F

DEMO_CSV = "\n".join(
    ['date,fund,company,ticker,cusip,shares,"market value ($)","weight (%)"']
    + [
        '01/05/2024,ARKK,TESLA INC,TSLA UW,88160R101,"4,120,767","$1,020,312,093",10.31%',
        '01/05/2024,ARKK,COINBASE GLOBAL,COIN UQ,19260Q107,"1,336,247","$297,928,293",3.01%',
        '01/05/2024,ARKK,ROKU INC,ROKU UW,77543R102,"3,234,956","$296,846,313",3.00%',
        '01/05/2024,ARKK,"UIPATH INC - CLASS A",PATH UW,90364P105,"9,129,313","$228,141,202",2.31%',
        '01/05/2024,ARKK,ROBLOX CORP,RBLX UN,771049103,"4,199,939","$191,173,223",1.93%',
    ]
    # enough holdings that the one disclaimer row stays inside the 10%
    # date-parse null budget (real ARK files are ~40 rows + disclaimer)
    + [
        f'01/05/2024,ARKK,DEMO HOLDING {i} INC,DH{i},DEMO{i:03d},"10,000","$1,000,000",0.0{i}%'
        for i in range(1, 8)
    ]
    + ["Investors should carefully consider investment objectives,,,,,,,"]
)


def cmd_demo() -> int:
    from .operators.merge import canonical_sort
    from .operators.normalize import normalize
    from .session import get_spark
    from .sources.data_reader import csv_to_df
    from .sources.parquet_store import read_ticker, write_ticker

    spark = get_spark(app_name="demo")
    with tempfile.TemporaryDirectory() as root:
        df = canonical_sort(normalize(csv_to_df(spark, DEMO_CSV)))
        write_ticker(df, root, "ARKK")
        holdings = read_ticker(spark, root, "ARKK")
        holdings.createOrReplaceTempView("holdings")
        out = spark.sql(
            """
            SELECT ticker, company, weight FROM holdings
            WHERE date = (SELECT max(date) FROM holdings)
            ORDER BY weight DESC LIMIT 10
            """
        )
        out.show(truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ark_invest_api_rust_data_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("demo")
    pr = sub.add_parser("refresh")
    pr.add_argument("--ticker", required=True)
    pr.add_argument("--source", default="ApiIncremental")
    pr.add_argument("--root", default="data/parquet")
    pb = sub.add_parser("backfill")
    pb.add_argument("--ticker", required=True)
    pb.add_argument("--csv-root", default="data/csv")
    pb.add_argument("--root", default="data/parquet")
    ps = sub.add_parser("scheduled-run")
    ps.add_argument("--root", default="data/parquet")
    args = p.parse_args(argv)

    if args.cmd == "demo":
        return cmd_demo()

    from .pipeline import csv_backfill, refresh_ticker, scheduled_run
    from .session import get_spark
    from .tickers import Source, Ticker

    spark = get_spark(app_name=f"cli-{args.cmd}")
    if args.cmd == "refresh":
        df = refresh_ticker(spark, Ticker[args.ticker], Source(args.source), args.root)
        df.orderBy(F.desc("date")).show(3)
    elif args.cmd == "backfill":
        df = csv_backfill(spark, Ticker[args.ticker], args.csv_root, args.root)
        if df is None:
            print(f"no CSV directory for {args.ticker}", file=sys.stderr)
            return 1
        df.show(3)
    elif args.cmd == "scheduled-run":
        results = scheduled_run(spark, root=args.root)
        for name, err in sorted(results.items()):
            print(f"{name}: {'ok' if err is None else err}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
