"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified with float rounding). Exit code 1 on any mismatch.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from wopen_spark.session import get_spark
from wopen_spark.tables import TESTDATA_TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_repr(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (benchdata/sf1+)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"WARN: unknown query names ignored: {sorted(unknown)}")

    spark = get_spark("correctness-check")
    failures = []
    executed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        executed += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(sdf)} (no oracle, rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s_n, o_n = normalize(sdf), normalize(odf)
        if list(s_n.columns) != list(o_n.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(s_n.columns)} != {list(o_n.columns)}")
            continue
        if len(s_n) != len(o_n):
            failures.append(name)
            print(f"FAIL {name}: rows {len(s_n)} != {len(o_n)}")
            continue
        sv, ov = value_repr(s_n), value_repr(o_n)
        if sv != ov:
            bad = [i for i, (a, b) in enumerate(zip(sv, ov)) if a != b][:3]
            failures.append(name)
            print(f"FAIL {name}: value mismatch at rows {bad}")
            for i in bad:
                print(f"   spark : {sv[i]}")
                print(f"   duckdb: {ov[i]}")
            continue
        print(f"ok   {name}: rows={len(sdf)} hash-match")
    print(
        f"\n{executed - len(failures)}/{executed} passed"
        + (f" (of {len(qs)} registered)" if executed != len(qs) else "")
        + (f"; FAILED: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
