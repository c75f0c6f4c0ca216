"""Driver-contract smoke: pytest alone must catch a registry wiring
break (r5 verdict #8). The full 230+-query gate lives in
tools/check_correctness.py; this runs the structural checks plus ~10
representative queries end-to-end through ``__spark_entry__`` against
the DuckDB oracle at the smallest SF — one per operator family, <60 s.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

from tests.conftest import SF_SMOKE

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one per family: relational agg, window, join, dedup, LSH, graph,
# similarity, text, streaming-ish topic sink, SQL front-door
SMOKE_QUERIES = [
    "pricing_summary",
    "top3_orders_per_priority",
    "customers_without_orders",
    "doc_fingerprint_dedup",
    "minhash_lsh_candidate_pairs",
    "near_dup_components",
    "fuzzy_top1_type_brand",
    "doc_token_stats",
    "topic_exactly_once_ingest",
    "sql_snapshot_time_travel",
]


def _entry():
    import __spark_entry__ as m

    return m


def test_registry_structure():
    """Every oracle belongs to a registered query; everything callable;
    the registry never silently shrinks."""
    m = _entry()
    qs, oracles = m.queries(), m.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert len(qs) >= 228  # r5 head count — a drop means lost registrations
    # all but the documented rows-only exceptions carry an oracle
    assert len(qs) - len(oracles) <= 3


def test_entry_returns_stable_frame(spark):
    m = _entry()
    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns


@pytest.mark.parametrize("name", SMOKE_QUERIES)
def test_smoke_query_matches_oracle(spark, name):
    m = _entry()
    qs, oracles = m.queries(), m.oracle_sql()
    sdf = qs[name](spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    from wopen_spark.tables import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        p = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    odf = con.execute(oracles[name]).df()

    from tools.check_correctness import normalize, value_repr

    s_n, o_n = normalize(sdf), normalize(odf)
    assert list(s_n.columns) == list(o_n.columns)
    assert len(s_n) == len(o_n)
    assert value_repr(s_n) == value_repr(o_n)
