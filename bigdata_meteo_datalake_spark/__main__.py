"""CLI: ``python -m bigdata_meteo_datalake_spark <cmd>``.

    list                         list registered queries (name, oracle?, tags)
    query NAME [--sf-dir DIR]    run one registry query, print rows
    verify [NAME...] [--sf-dir D] run queries against their DuckDB oracles
    run --lake-root DIR --date D run the daily movies pipeline on a raw lake
    profile NAME [--sf-dir DIR]  print the formatted physical plan
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bigdata_meteo_datalake_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list")

    qp = sub.add_parser("query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)

    pp = sub.add_parser("profile")
    pp.add_argument("name")
    pp.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    vp = sub.add_parser("verify")
    vp.add_argument("names", nargs="*")
    vp.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    rp = sub.add_parser("run")
    rp.add_argument("--lake-root", required=True)
    rp.add_argument("--date", required=True)
    rp.add_argument("--run-id", default="cli")
    rp.add_argument("--no-quality", action="store_true")

    args = p.parse_args(argv)

    from .queries import REGISTRY, queries

    if args.cmd == "list":
        qs = queries()
        for name in sorted(qs):
            q = REGISTRY[name]
            flag = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} {flag:9s} {','.join(q.tags)}")
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    if args.cmd == "query":
        df = queries()[args.name](spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        print(f"[{df.count()} rows]")
    elif args.cmd == "verify":
        from .oracle import compare_to_oracle

        qs = queries()
        names = args.names or [n for n in sorted(qs) if REGISTRY[n].oracle]
        failed = 0
        for name in names:
            q = REGISTRY[name]
            if q.oracle is None:
                print(f"SKIP  {name} (rows-only: no oracle by design)")
                continue
            try:
                compare_to_oracle(q.fn(spark, args.sf_dir), q.oracle, args.sf_dir)
                print(f"OK    {name}")
            except AssertionError as exc:
                failed += 1
                print(f"FAIL  {name}: {str(exc).splitlines()[0][:120]}")
        print(f"[{len(names) - failed}/{len(names)} verified]")
        return 1 if failed else 0
    elif args.cmd == "profile":
        from .plans.explain import plan_string

        df = queries()[args.name](spark, args.sf_dir)
        print(plan_string(df))
    elif args.cmd == "run":
        from .plans.pipeline import run

        res = run(
            spark,
            args.lake_root,
            args.date,
            run_id=args.run_id,
            enforce_quality=not args.no_quality,
        )
        res.quality_report.show(100, truncate=False)
        for name in ("movies_enriched_daily", "kpi_daily_summary"):
            print(f"== {name}")
            res.tables[name].show(25, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
