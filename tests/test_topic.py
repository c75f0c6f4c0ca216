"""FileTopic + TopicLoader — offset algebra and exactly-once loading.

The contract under test: the committed offset IS the SnapshotTable's
transactional high-water mark (one atomic record carries data + offset),
so reruns, replays, and crash-reruns land every record exactly once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from wopen_spark.snapshot_table import SnapshotTable
from wopen_spark.streaming.topic import FileTopic, TopicLoader

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _recs(lo, n):
    return [{"k": i, "v": f"r{i}"} for i in range(lo, lo + n)]


@pytest.fixture
def topic(tmp_path):
    return FileTopic(str(tmp_path / "topic"), partitions=2)


def test_offset_assignment_and_head(topic):
    assert topic.head(0) == 0
    assert topic.produce(0, _recs(0, 3)) == (0, 3)
    assert topic.produce(0, _recs(3, 2)) == (3, 5)
    assert topic.head(0) == 5
    assert topic.head(1) == 0  # partitions are independent logs
    assert topic.produce(1, []) == (0, 0)  # empty produce assigns nothing


def test_read_prunes_segments_by_name(spark, topic):
    """Segment selection is by file NAME: a range covering only the
    second segment must not open the first (asserted via inputFiles)."""
    topic.produce(0, _recs(0, 4))
    topic.produce(0, _recs(4, 4))
    df = topic.read(spark, 0, 5, 8, SCHEMA)
    assert len(df.inputFiles()) == 1  # only the overlapping segment
    got = sorted(r["k"] for r in df.collect())
    assert got == [5, 6, 7]  # residual filter trims inside the segment
    assert sorted(r["_offset"] for r in df.collect()) == [5, 6, 7]


def test_loader_exactly_once_across_reruns(spark, tmp_path, topic):
    topic.produce(0, _recs(0, 5))
    topic.produce(1, _recs(100, 5))
    table = SnapshotTable(spark, str(tmp_path / "tbl"))
    table.create(spark.createDataFrame([], SCHEMA))
    loader = TopicLoader(topic, table, group="g", schema=SCHEMA)

    committed = loader.run_once(spark)
    assert committed == {0: (0, 5), 1: (0, 5)}
    assert loader.committed(0) == 5 and loader.committed(1) == 5
    v = table.latest_version()

    # rerun with no new data: nothing reads, nothing commits
    assert loader.run_once(spark) == {}
    assert table.latest_version() == v

    # new data on ONE partition: only its delta loads
    topic.produce(0, _recs(5, 3))
    assert loader.run_once(spark) == {0: (5, 8)}
    assert sorted(r["k"] for r in table.read().collect()) == (
        list(range(8)) + list(range(100, 105))
    )

    # crash-replay: re-deliver an already-committed range through the
    # sink with its original txn version — rejected by the high-water
    replay = topic.read(spark, 0, 0, 5, SCHEMA).select("k", "v")
    head = table.latest_version()
    table.append(replay, txn_app="g/p0", txn_version=5)
    assert table.latest_version() == head
    assert table.read().count() == 13


def test_loader_committed_reads_table_ledger_not_side_state(spark, tmp_path, topic):
    """A FRESH loader instance (process restart) resumes from the
    table's ledger — there is no loader-local state to lose."""
    topic.produce(0, _recs(0, 4))
    table = SnapshotTable(spark, str(tmp_path / "tbl"))
    table.create(spark.createDataFrame([], SCHEMA))
    TopicLoader(topic, table, group="g", schema=SCHEMA).run_once(spark)

    fresh = TopicLoader(topic, table, group="g", schema=SCHEMA)
    assert fresh.committed(0) == 4
    assert fresh.run_once(spark) == {}
    # a different GROUP is an independent consumer: it re-reads from 0
    other = TopicLoader(topic, table, group="g2", schema=SCHEMA)
    assert other.committed(0) == 0


def test_topic_as_structured_stream_exactly_once(spark, tmp_path, topic):
    """Continuous consumption of the same log: readStream over the
    segment files, landed through the transactional sink. Segments
    produced across multiple calls arrive over multiple micro-batches
    (maxFilesPerTrigger), the checkpoint dedups files, and a second
    availableNow run with no new segments adds nothing."""
    topic.produce(0, _recs(0, 3))
    topic.produce(0, _recs(3, 3))
    topic.produce(1, _recs(100, 3))
    table = SnapshotTable(spark, str(tmp_path / "tbl"))
    table.create(
        spark.createDataFrame(
            [], T.StructType(list(SCHEMA.fields) + [
                T.StructField("_partition", T.IntegerType()),
                T.StructField("_offset", T.LongType()),
            ])
        )
    )

    def run():
        q = (
            topic.stream(spark, SCHEMA)
            .writeStream.foreachBatch(table.streaming_sink("cont"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = sorted(r["k"] for r in table.read().collect())
    assert got == [0, 1, 2, 3, 4, 5, 100, 101, 102]
    v = table.latest_version()
    run()  # no new segments: checkpoint says caught up
    assert table.read().count() == 9
    # late segment: only IT flows through the next run
    topic.produce(1, _recs(103, 2))
    run()
    assert sorted(r["k"] for r in table.read().collect())[-2:] == [103, 104]
    assert table.read().count() == 11


UP_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_upsert_loader_latest_state_exactly_once(spark, tmp_path, topic):
    """UpsertTopicLoader: the table converges to the newest record per
    key; intra-batch dedup, rerun no-ops, replay rejection, and the
    out-of-order guard (an older seq never regresses state) all hold."""
    from wopen_spark.streaming.topic import UpsertTopicLoader

    table = SnapshotTable(spark, str(tmp_path / "latest"))
    table.create(spark.createDataFrame([], UP_SCHEMA), cluster_by=["k"])
    loader = UpsertTopicLoader(
        topic, table, group="up", schema=UP_SCHEMA, key="k", order_col="seq"
    )
    # batch 1 on p0 carries a key twice: intra-batch dedup keeps seq=2
    topic.produce(0, [
        {"k": 1, "seq": 1, "v": "a1"},
        {"k": 1, "seq": 2, "v": "a2"},
        {"k": 2, "seq": 1, "v": "b1"},
    ])
    topic.produce(1, [{"k": 3, "seq": 1, "v": "c1"}])
    r1 = loader.run_once(spark)
    assert set(r1) == {0, 1}
    got = {r.k: (r.seq, r.v) for r in table.read().collect()}
    assert got == {1: (2, "a2"), 2: (1, "b1"), 3: (1, "c1")}

    # batch 2: newer update for k=1, STALE record for k=2 (seq=0 — the
    # ordering guard must leave b1 in place), new key 4
    topic.produce(0, [
        {"k": 2, "seq": 0, "v": "stale"},
        {"k": 1, "seq": 5, "v": "a5"},
        {"k": 4, "seq": 1, "v": "d1"},
    ])
    r2 = loader.run_once(spark)
    assert set(r2) == {0}
    got = {r.k: (r.seq, r.v) for r in table.read().collect()}
    assert got == {1: (5, "a5"), 2: (1, "b1"), 3: (1, "c1"), 4: (1, "d1")}

    # caught up: rerun is a no-op, version unchanged
    v = table.latest_version()
    assert loader.run_once(spark) == {}
    assert table.latest_version() == v

    # crash-replay of batch 1 with its original txn version: rejected
    replay = topic.read(spark, 0, 0, r1[0][1], UP_SCHEMA).select("k", "seq", "v")
    rep = table.merge_into(
        replay.dropDuplicates(["k"]), "k",
        not_matched=[{"action": "insert", "cond": None}],
        txn_app="up/p0", txn_version=r1[0][1],
    )
    assert rep.get("replayed") and table.latest_version() == v

    # three merge commits landed (p0+p1 round 1, p0 round 2) — the
    # replayed batch and the caught-up rerun added none
    ops = [h["operation"] for h in table.history()]
    assert ops.count("merge") == 3


def test_produce_df_matches_produce_layout_and_contents(spark, tmp_path):
    """produce_df (executor-side, Arrow + pandas json writer) must be
    indistinguishable from produce() to every consumer: same one-segment-
    per-partition-per-call naming, same stamped offsets, same records —
    including doubles surviving the round trip — and heads advance so a
    second call appends a second segment."""
    import os

    from pyspark.sql import functions as F

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("v"),
        (F.col("id") * 0.125 + 0.333).alias("x"),  # not exactly representable
        (F.col("id") % 2).cast("int").alias("_p"),
    )
    t_df = FileTopic(str(tmp_path / "a"), partitions=2)
    t_df.produce_df(df.filter(F.col("k") < 30), "_p")
    t_df.produce_df(df.filter(F.col("k") >= 30), "_p")

    t_cl = FileTopic(str(tmp_path / "b"), partitions=2)
    rows = sorted(
        (r.asDict() for r in df.collect()), key=lambda d: d["k"]
    )
    for lo, hi in ((0, 30), (30, 40)):
        for p in (0, 1):
            t_cl.produce(
                p,
                [
                    {k: v for k, v in d.items() if k != "_p"}
                    for d in rows
                    if d["_p"] == p and lo <= d["k"] < hi
                ],
            )

    for p in (0, 1):
        assert t_df.head(p) == t_cl.head(p)
        names = lambda t: sorted(
            n for n in os.listdir(os.path.join(t.path, f"p{p}"))
            if n.endswith(".jsonl")
        )
        assert names(t_df) == names(t_cl), p  # same segment naming
        a = t_df.read(spark, p, 0, t_df.head(p), schema)
        b = t_cl.read(spark, p, 0, t_cl.head(p), schema)
        ra = sorted((r.k, r.v, r.x) for r in a.collect())
        rb = sorted((r.k, r.v, r.x) for r in b.collect())
        assert ra == rb, p  # identical records incl. exact doubles
        offs = sorted(r["_offset"] for r in a.collect())
        assert offs == list(range(len(offs)))  # contiguous stamped offsets
