"""Subprocess writer for the cross-process SnapshotTable race test.

NOT a pytest module — spawned by tests/test_snapshot_race.py as
``python snapshot_race_worker.py <table> <writer_id> <n> <seed> <out>``.
Each worker owns its own JVM + SparkSession, so the put-if-absent commit
protocol (O_EXCL hardlink in LocalLogStore) is raced by two genuinely
independent OS processes — the in-process monkeypatch races in
test_snapshot_table.py cannot exercise the filesystem-level atomicity
this one does.

The worker appends rows tagged (writer, seq) so the parent can assert
no update was lost, and sprinkles compact (raises on lost race — the
worker records the conflict and moves on) and vacuum (no commit, just
physical deletes gated by retain/grace) between appends to stress the
remove/rewrite paths concurrently.
"""

from __future__ import annotations

import json
import random
import sys


def main() -> int:
    table_path, writer_id, n_appends, seed, out_file = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
        sys.argv[5],
    )
    from pyspark.sql import SparkSession

    from wopen_spark.snapshot_table import CommitConflictError, SnapshotTable

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"snapshot-race-w{writer_id}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    table = SnapshotTable(spark, table_path)
    rng = random.Random(seed)
    events: list[dict] = []
    try:
        for i in range(n_appends):
            rid = writer_id * 1_000_000 + i
            v = table.append(
                spark.createDataFrame(
                    [(rid, writer_id, i)], "id long, writer int, seq int"
                ).coalesce(1)
            )
            events.append({"op": "append", "version": v, "id": rid})
            roll = rng.random()
            if roll < 0.35:
                try:
                    r = table.compact(target_files=2)
                    events.append({"op": "compact", "version": r["version"]})
                except CommitConflictError:
                    # non-commuting op lost the race: correct behavior is
                    # to surface it, not silently clobber — record & go on
                    events.append({"op": "compact_conflict"})
            elif roll < 0.55:
                removed = table.vacuum(retain_last=3, orphan_grace_s=3600.0)
                events.append({"op": "vacuum", "removed": removed})
            elif roll < 0.8:
                # multi-clause MERGE racing appends/compacts/vacuums from
                # the other process: upsert into a writer-owned key band
                # (merge is non-commuting — a lost race surfaces as
                # CommitConflictError, recorded, never silently retried)
                mid = writer_id * 2_000_000 + i
                try:
                    r = table.merge_into(
                        spark.createDataFrame(
                            [(mid, writer_id, 100 + i)],
                            "id long, writer int, seq int",
                        ).coalesce(1),
                        "id",
                        matched=[
                            {
                                "action": "update",
                                "cond": None,
                                "set": {"seq": "s.seq"},
                            }
                        ],
                        not_matched=[{"action": "insert", "cond": None}],
                        mode="dv" if rng.random() < 0.5 else "cow",
                    )
                    events.append(
                        {
                            "op": "merge",
                            "version": r["version"],
                            "id": mid,
                            "seq": 100 + i,
                        }
                    )
                except CommitConflictError:
                    events.append({"op": "merge_conflict"})
        with open(out_file, "w") as f:
            json.dump(events, f)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
