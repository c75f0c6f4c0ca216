"""Scale-safe exact global ranking: row_number / NTILE without a
single-partition window.

``Window.orderBy(...)`` with no partition key funnels EVERY row through
one task — fine on a dimension, a non-starter on a fact (the r05 audit
caught order_value_gini sorting the whole orders table on one core).
The classic distributed fix is two-phase ranking, expressed here
declaratively:

1. bucket each row by a low-cardinality expression MONOTONE in the
   leading sort key (value ranges, date ranges, ...);
2. per-bucket counts -> prefix-sum window over the FEW bucket rows ->
   broadcast per-bucket offsets;
3. per-bucket local ``row_number`` (parallel across buckets) + offset
   = exact global rank, identical to the single-partition answer
   including tie-breaks (buckets partition the sort order).

Exact SQL NTILE then derives from the global rank and the partition
total: the first ``n % k`` tiles hold ``n div k + 1`` rows each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_row_number(
    df: DataFrame,
    bucket: Column,
    order_cols: list,
    partition_cols: list[str] | None = None,
    out: str = "i",
) -> DataFrame:
    """Add ``out`` = exact row_number over ``partition_cols`` ordered by
    ``order_cols``, computed with per-bucket parallelism.

    ``bucket`` MUST be non-decreasing along the sort order within each
    partition (e.g. a value-range of the leading sort key) and
    low-cardinality enough that (partitions x buckets) rows broadcast —
    thousands is fine, it is the parallelism knob, not the data."""
    pc = list(partition_cols or [])
    b = df.withColumn("__bkt", bucket)
    per = b.groupBy(*pc, "__bkt").agg(F.count(F.lit(1)).alias("__c"))
    if pc:
        wp = (
            Window.partitionBy(*pc)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        wp = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = per.withColumn(
        "__off", F.coalesce(F.sum("__c").over(wp), F.lit(0).cast("long"))
    )
    lw = Window.partitionBy(*pc, "__bkt").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offs.select(*pc, "__bkt", "__off")), [*pc, "__bkt"])
        .withColumn(out, F.col("__off") + F.row_number().over(lw))
        .drop("__bkt", "__off")
    )


def bucketed_ntile(
    df: DataFrame,
    k: int,
    bucket: Column,
    order_cols: list,
    partition_cols: list[str] | None = None,
    out: str = "tile",
) -> DataFrame:
    """Add ``out`` = exact SQL NTILE(k) over ``partition_cols`` ordered by
    ``order_cols`` — same two-phase bucketing as
    :func:`bucketed_row_number`, then the standard NTILE split: with
    n = partition size, q = n div k, r = n mod k, the first r tiles hold
    q+1 rows. Matches ``F.ntile(k).over(...)`` row-for-row."""
    pc = list(partition_cols or [])
    # Same two-phase layout as bucketed_row_number, but the partition
    # total __n rides ON the per-bucket offset frame (one more window
    # over the FEW bucket rows) instead of a groupBy over the ranked
    # output — deriving __n from `ranked` would re-execute the whole
    # fact subtree plus its rank window a second time.
    b = df.withColumn("__bkt", bucket)
    per = b.groupBy(*pc, "__bkt").agg(F.count(F.lit(1)).alias("__c"))
    if pc:
        wp = (
            Window.partitionBy(*pc)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wn = Window.partitionBy(*pc)
    else:
        wp = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
        wn = Window.partitionBy()
    offs = per.select(
        *pc,
        "__bkt",
        F.coalesce(F.sum("__c").over(wp), F.lit(0).cast("long")).alias("__off"),
        F.sum("__c").over(wn).alias("__n"),
    )
    lw = Window.partitionBy(*pc, "__bkt").orderBy(*order_cols)
    ranked = (
        b.join(F.broadcast(offs), [*pc, "__bkt"])
        .withColumn("__i", F.col("__off") + F.row_number().over(lw))
        .drop("__bkt", "__off")
    )
    # exact NTILE arithmetic on longs; ceil(a/b) for positive longs is
    # (a + b - 1) div b. With q = n div k and r = n mod k: tiles 1..r
    # hold q+1 rows, tiles r+1..k hold q rows (q = 0 degenerates to the
    # first branch: tile = i).
    tile = F.when(
        F.col("__i") <= (F.expr(f"__n div {k}") + 1) * (F.col("__n") % k),
        F.expr(f"(__i + (__n div {k})) div ((__n div {k}) + 1)"),
    ).otherwise(
        F.col("__n") % k
        + F.expr(
            f"(__i - ((__n div {k}) + 1) * (__n % {k}) + (__n div {k}) - 1) "
            f"div (__n div {k})"
        )
    )
    return ranked.withColumn(out, tile.cast("int")).drop("__i", "__n")
