"""Scale up the driver's test data for regression-meaningful benchmarks.

At sf0.1 every query finishes in <4 s, dominated by fixed overhead —
regressions hide (VERDICT r1, next-round item 1). This tool replicates
the sf0.1 tables K times with consistent key remapping into a repo-local
directory (gitignored), producing sf1/sf10-equivalent inputs that
``bench.py`` can point at via ``SPARK_GRAFT_SF_DIR``.

Key remapping keeps referential integrity: replica ``i`` offsets each
key domain by ``i * span`` (spans are fixed round numbers far above the
base domains), so every join/group query sees K× the rows with the same
join fan-outs, selectivities, and group counts per key — a faithful
larger day, not K disconnected copies of the same day. Dimension tables
(region/nation) keep their TPC-H-fixed cardinality. Document text and
embedding vectors are replicated verbatim, which scales the dup-heavy
corpus scenario the dedup/ANN operators are built for (each minhash/LSH
bucket grows K×, uniformly — no skew is introduced).

Usage: python tools/make_scaled_data.py [factor] [src_dir] [dst_dir]
       (defaults: 10 /root/testdata/sf0.1 benchdata/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# fixed per-domain offsets; far above every base key's max at sf0.1
SPANS = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 100_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# table -> {column: key domain}
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_ONLY = ("region", "nation")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "benchdata/sf1"

    from wopen_spark.queries.registry import _t
    from wopen_spark.session import get_spark

    spark = get_spark("make-scaled-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for name in COPY_ONLY:
        _t(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        print(f"{name}: copied")

    for name, keys in KEYED.items():
        base = _t(spark, src, name)  # events: ns->us ts normalization
        parts = []
        for i in range(factor):
            rep = base
            for col, domain in keys.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * SPANS[domain]))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # spread output files so downstream scans start parallel
        n_files = max(spark.sparkContext.defaultParallelism, factor)
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        n = spark.read.parquet(os.path.join(dst, f"{name}.parquet")).count()
        print(f"{name}: {n} rows ({factor}x)")


if __name__ == "__main__":
    main()
