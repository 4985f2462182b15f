"""Reproduce the driver's harness shape for one suspect query.

The driver runs ALL registered queries in ONE vanilla SparkSession
(no engine configs), registry order, then compares each result to its
DuckDB oracle (row count, sorted columns, order-insensitive value
hash). ``tools/verify_local.py`` runs queries independently, so a
session-state interaction (a conf another query leaves behind, tmp-dir
pressure, lazy-plan re-execution) can make a query red under the
driver yet green under verify_local — exactly the r13 `dedup_exact`
red cell. This tool reproduces the driver shape.

Usage:
    python tools/driver_repro.py [sf_dir] [suspect ...]

Runs every query (executing each fully via toPandas), and for each
SUSPECT (default: dedup_exact) does a full value-level diff against
its DuckDB oracle — including a per-leg breakdown when a `leg` column
is present — plus a run-to-run self-comparison (collect twice).
"""

from __future__ import annotations

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

from tools.verify_local import compare, duck_con, normalize  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    suspects = set(sys.argv[2:]) or {"dedup_exact"}

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # Vanilla session, like the driver — NOT get_spark().
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        try:
            pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in suspects:
            print(f"ran   {name}: {len(pdf)} rows")
            continue
        df = fn(spark, sf_dir)
        pdf2 = df.toPandas()
        pdf3 = df.toPandas()  # same plan collected twice: re-execution drift?
        duck = con.sql(oracles[name]).df() if name in oracles else None
        print(f"== suspect {name}: {len(pdf)} rows (in-order run)")
        if not normalize(pdf2).equals(normalize(pdf3)):
            failures += 1
            print(f"FAIL  {name}: SAME plan collected twice differs (nondeterministic re-execution)")
        if not normalize(pdf).equals(normalize(pdf2)):
            failures += 1
            print(f"FAIL  {name}: two invocations differ (plan-construction nondeterminism)")
            _leg_diff(pdf, pdf2, "invocation1", "invocation2")
        if duck is not None:
            problems = compare(name, pdf, duck)
            if problems:
                failures += 1
                print(f"FAIL  {name} vs oracle: " + "; ".join(problems))
                _leg_diff(pdf, duck, "spark", "duck")
            else:
                print(f"PASS  {name} vs oracle")
    print(f"{failures} failures")
    return 1 if failures else 0


def _leg_diff(a: pd.DataFrame, b: pd.DataFrame, la: str, lb: str) -> None:
    """Per-leg localization: if the frames carry a `leg` column, report
    which legs' row sets differ, with up to 3 example rows each way."""
    if "leg" not in a.columns or "leg" not in b.columns:
        return
    for leg in sorted(set(a["leg"]) | set(b["leg"])):
        na = normalize(a[a["leg"] == leg].reset_index(drop=True))
        nb = normalize(b[b["leg"] == leg].reset_index(drop=True))
        if na.equals(nb):
            print(f"   leg {leg}: OK ({len(na)} rows)")
            continue
        merged_a = na.merge(nb, how="left", indicator=True)
        merged_b = nb.merge(na, how="left", indicator=True)
        only_a = merged_a[merged_a["_merge"] == "left_only"].drop(columns="_merge")
        only_b = merged_b[merged_b["_merge"] == "left_only"].drop(columns="_merge")
        print(f"   leg {leg}: DIFFERS — {len(only_a)} rows only in {la}, {len(only_b)} only in {lb}")
        if len(only_a):
            print(f"     only in {la}:\n{only_a.head(3).to_string()}")
        if len(only_b):
            print(f"     only in {lb}:\n{only_b.head(3).to_string()}")


if __name__ == "__main__":
    raise SystemExit(main())
