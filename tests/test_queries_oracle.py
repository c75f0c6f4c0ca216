"""t1 smoke + t2-style oracle check for every registered query at sf0.001.

Mirrors the driver's gate: row count, sorted column names, and
order-insensitive stringified values must match DuckDB.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    out = []
    for row in df.itertuples(index=False):
        out.append(tuple(f"{v:.6g}" if isinstance(v, float) else str(v) for v in row))
    return out


def _query_names():
    from wopen_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from wopen_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # smoke only: runs and yields a stable schema
        return
    odf = duck.execute(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert _normalize(sdf) == _normalize(odf)
