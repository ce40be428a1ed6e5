"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every registered query at a given sf_dir through BOTH engines and
compares row count, column-name set, and order-insensitive values
(columns sorted by name, rows sorted lexicographically, exact equality
— the queries themselves are responsible for rounding floats).

Usage:  python tools/check_oracle.py [sf_dir] [qname ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadems_spark.catalog import TABLES  # noqa: E402
from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
    sc, dc = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pd), normalize(duck_pd)
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        # The driver hashes stringified values, so an int64 42 vs a
        # float64 42.0 (DuckDB SUM(BIGINT) -> HUGEINT -> float64) IS a
        # mismatch even though the numbers are equal.  Compare dtype
        # kind first, then exact values, mirroring that strictness.
        ak = pd.Series(a).dtype.kind
        bk = pd.Series(b).dtype.kind
        if {ak, bk} <= {"i", "u"}:
            pass  # int widths are repr-identical
        elif "M" in (ak, bk) and {ak, bk} <= {"M", "O"}:
            # Spark DATE -> object(datetime.date), DuckDB DATE ->
            # datetime64[ns]: the driver's hash stringifies both to
            # ISO dates (r02: q_date_funcs hash-matched), so compare
            # as normalized datetimes rather than flagging the kinds.
            sa = pd.to_datetime(pd.Series(a)).astype(str)
            sb = pd.to_datetime(pd.Series(b)).astype(str)
            bad = (sa != sb).to_numpy()
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} diffs, first@{i}: "
                    f"spark={sa[i]} duck={sb[i]}"
                )
            continue
        elif ak != bk:
            problems.append(f"col {c}: dtype kind spark={ak} duck={bk} (hash-breaking)")
            continue
        if ak == "f" or bk == "f":
            af, bf = a.astype(float), b.astype(float)
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} diffs, first@{i}: "
                    f"spark={af[i]!r} duck={bf[i]!r} (maxabs="
                    f"{np.nanmax(np.abs(af - bf)):.3e})"
                )
            else:
                # exact-equal floats can still hash apart: -0.0 vs 0.0
                sr = pd.Series(af).map(repr)
                dr = pd.Series(bf).map(repr)
                bad = (sr != dr).to_numpy()
                if bad.any():
                    i = int(np.argmax(bad))
                    problems.append(
                        f"col {c}: {int(bad.sum())} repr diffs, first@{i}: "
                        f"spark={sr[i]} duck={dr[i]}"
                    )
        else:
            eq = pd.Series(a).astype(str) == pd.Series(b).astype(str)
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} diffs, first@{i}: spark={a[i]!r} duck={b[i]!r}"
                )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    registry = load_registry()
    only = set(args) or set(registry)
    spark = get_spark("check-oracle")
    con = duck_con(sf_dir)
    failed, passed, rows_only = [], [], []
    for name, (fn, sql) in sorted(registry.items()):
        if name not in only:
            continue
        t0 = time.time()
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception:
            failed.append(name)
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            continue
        if sql is None:
            rows_only.append(name)
            print(f"rows-only {name}: {len(spark_pd)} rows [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pd = con.execute(sql).df()
        except Exception:
            failed.append(name)
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            continue
        problems = compare(name, spark_pd, duck_pd)
        if problems:
            failed.append(name)
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"    {p}")
        else:
            passed.append(name)
            print(f"ok   {name}: {len(spark_pd)} rows [{time.time()-t0:.1f}s]")
    print(
        f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed"
        + (f": {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
