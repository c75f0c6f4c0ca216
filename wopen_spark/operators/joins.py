"""Join operators Spark lacks natively: as-of join and skew-salted
aggregation.

As-of join (backward): for each left row, the latest right row with
``right_ts <= left_ts`` per key. Implemented as the union-merge pattern —
tag sides, union, one window over (key, ts) carrying the last-seen right
payload — so it costs ONE shuffle on the key and a per-partition sort,
never the range-join pair explosion (a naive inequality join is O(L×R)
per key). This is the scalable shape for 100 TB time-series alignment.

Salted aggregation: two-phase aggregate for skewed grouping keys. Phase 1
groups on (key, salt) — the hot key's rows spread over ``buckets``
reducers — phase 2 recombines per key. AQE splits skewed JOIN partitions
but does nothing for a skewed aggregate whose hot key exceeds one
reducer; explicit salting is the standard fix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of left join per ``by`` key: ``direction='backward'`` attaches
    the latest right row at or before each left row's timestamp;
    ``'forward'`` the earliest right row at or after it.

    ``right_cols`` are the right payload columns to carry (renamed with
    ``suffix`` on collision). Tie-break on equal right timestamps is
    deterministic: max (ts, payload-struct) for backward, min for
    forward — i.e. ORDER BY ts [DESC], payload [DESC] LIMIT 1 semantics.
    """
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(by).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l_cols = left.columns
    lf = left.select(
        F.col(by).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in l_cols],
    )
    merged = r.unionByName(lf, allowMissingColumns=True)
    return asof_join_merged(merged, l_cols, right_cols, right_ts, suffix, direction)


def asof_join_merged(
    merged: DataFrame,
    l_cols: list[str],
    right_cols: list[str],
    right_ts: str = "ts",
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """The window-merge core of :func:`asof_join`, taking an already
    union-tagged frame (``__key``, ``__t``, ``__side`` 0=right/1=left,
    ``__payload`` struct with ``__ts`` + payload fields, plus the left
    columns on side-1 rows).

    Build the tagged frame yourself when BOTH sides derive from one
    table: a single scan with a conditional payload replaces two scans
    of the same file (the asof_click_before_purchase shape — left =
    purchases, right = clicks, one events scan). Note the carry window
    needs no right-side pre-dedup: ``last()`` over the (ts, side,
    payload) order already resolves equal-timestamp right rows to the
    greatest payload, which IS the max-id tie-break.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    # right rows sort before left rows at equal ts (__side 0 < 1), so an
    # equal-timestamp right row IS visible to the left row (backward:
    # ts_r <= ts_l; forward: ts_r >= ts_l). Forward scans time DESCENDING
    # with the payload also descending, so last() resolves equal-ts right
    # rows to the MIN payload — the "earliest next" semantics.
    if direction == "backward":
        order = [F.asc("__t"), F.asc("__side"), F.asc("__payload")]
    else:
        order = [F.desc("__t"), F.asc("__side"), F.desc("__payload")]
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__last", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *l_cols,
        *[
            F.col("__last").getField(c).alias(c + (suffix if c in l_cols else ""))
            for c in right_cols
        ],
        F.col("__last").getField("__ts").alias(right_ts + "_asof"),
    )
    return out


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    buckets: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (input Column, fn) with fn in
    {'sum','count','min','max'}. ``salt_col`` defaults to a uniform hash
    of the whole row's first key-independent expression — pass an explicit
    column (e.g. a row id) for reproducibility.
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in {fn for _, fn in aggs.values()}:
        if fn not in merge:
            raise ValueError(f"unsupported agg {fn!r}")

    salt = (
        F.pmod(F.hash(F.col(salt_col)), F.lit(buckets))
        if salt_col
        else F.pmod(F.hash(F.rand(42)), F.lit(buckets))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[first[fn](col).alias(name) for name, (col, fn) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge[fn](F.col(name)).alias(name) for name, (_, fn) in aggs.items()]
    )


def range_join_within(
    df: DataFrame,
    by: str,
    ts_col: str,
    window_seconds: int,
    id_col: str,
) -> DataFrame:
    """All pairs of rows with the same ``by`` key whose timestamps are
    within ``window_seconds`` (id_a < id_b), via bucket-join.

    The scale path for bounded-range self-joins: a naive inequality join
    degenerates to a per-key cross product. Bucketing ts into window-sized
    buckets and exploding one side to its 3 neighbouring buckets turns it
    into an EQUI-join on (key, bucket) — one hash shuffle, candidates
    bounded by bucket occupancy, and each qualifying pair matches exactly
    one exploded bucket (the right side's bucket is unique).
    """
    w_us = window_seconds * 1_000_000
    # unix_micros requires TIMESTAMP; parquet event ts is TIMESTAMP_NTZ.
    # The NTZ->LTZ cast applies one consistent offset to every row, which
    # cancels in both the pair delta and the bucket±1 neighbourhood math.
    ev = df.select(
        F.col(id_col),
        F.col(by),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
    ).withColumn("__bkt", F.floor(F.col("__us") / w_us))
    a = ev.select(
        F.col(id_col).alias("id_a"),
        F.col(by),
        F.col("__us").alias("us_a"),
        F.explode(
            F.array(F.col("__bkt") - 1, F.col("__bkt"), F.col("__bkt") + 1)
        ).alias("__jb"),
    )
    b = ev.select(
        F.col(id_col).alias("id_b"),
        F.col(by),
        F.col("__us").alias("us_b"),
        F.col("__bkt").alias("__jb"),
    )
    return (
        a.join(b, [by, "__jb"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_b") - F.col("us_a")) <= w_us)
        )
        .select(by, "id_a", "id_b", (F.col("us_b") - F.col("us_a")).alias("delta_us"))
    )
