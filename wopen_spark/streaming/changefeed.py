"""Exactly-once incremental consumption of a SnapshotTable's change feed.

The Delta "stream from a table" pattern as AvailableNow micro-batches:
a downstream job reads ``read_changes(committed, head]`` — cost
O(files changed), never O(table) — folds the batch, and appends the
result to a downstream SnapshotTable in ONE atomic commit that also
carries the upstream-version high-water mark (the table's ``txn_app``
ledger, same mechanism as streaming.topic.TopicLoader). A crash between
fold and commit re-delivers the whole batch; a replayed commit is
rejected by the high-water mark — rows land exactly once.

The canonical fold is an incremental materialized view: emit SIGNED
per-group deltas (+ for inserts, - for deletes; an update arrives as
delete(old) + insert(new) and nets out) and read the MV as a sum over
the delta log. Maintenance commits (compact/zorder) emit no changes
upstream, so the MV never sees rewrite churn.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wopen_spark.snapshot_table import SnapshotTable, VacuumedVersionError


class ChangeFeedLoader:
    """Fold a source table's CDF into a target table, exactly once.

    ``fold(changes)``: maps a change-feed DataFrame (source schema plus
    ``_change_type``/``_commit_version``) to the rows to append. It must
    be a pure function of the batch — reruns after a crash see the same
    batch and must produce equivalent rows. For vacuum recovery
    (:meth:`resync`) it must additionally satisfy the snapshot identity:
    folding the CURRENT live rows as one all-inserts batch yields the
    full target state (true for any insert/delete-signed delta fold —
    the canonical incremental-MV shape)."""

    def __init__(
        self,
        source: SnapshotTable,
        target: SnapshotTable,
        app: str,
        fold: Callable[[DataFrame], DataFrame],
    ):
        self.source = source
        self.target = target
        self.app = app
        self.fold = fold

    def committed(self) -> int:
        """Upstream version already folded into the target (its txn
        ledger is the ONLY checkpoint — no side files to drift)."""
        try:
            state = self.target._state()
        except FileNotFoundError:
            return 0
        return max(0, state["txns"].get(self.app, 0))

    def resync(self) -> tuple[int, int]:
        """Vacuum-recovery bootstrap: when the resume point's change
        files are gone, rebuild the target from a FULL snapshot read at
        the source's current head — every live row presented to ``fold``
        as one all-inserts batch — and jump the watermark to the head in
        the SAME atomic commit (``overwrite`` carries the txn ledger
        entry). Cost O(source live rows), the unavoidable price of
        falling behind retention; after it the loader is incremental
        again. Replay-safe like every other commit here: a crashed
        resync reruns, a replayed one is rejected by the high-water
        mark."""
        end = self.source.latest_version()
        if end is None:
            raise FileNotFoundError(
                f"cannot resync from a non-existent source {self.source.path}"
            )
        snap = (
            self.source.read(version=end)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(end).cast("int"))
        )
        out = self.fold(snap)
        if self.target.latest_version() is None:
            self.target.create(out.limit(0))
        self.target.overwrite(out, txn_app=self.app, txn_version=end)
        return (0, end)

    def run_once(self) -> tuple[int, int] | None:
        """One micro-batch: fold ``(committed, head]`` and commit it with
        ``txn_version = head``. Returns the folded range, or None when
        caught up (including on a not-yet-created source). Empty change
        ranges (head advanced by maintenance-only commits) still commit
        the watermark so later runs skip the dataChange=false scan. A
        resume point stranded behind a vacuum (the typed
        VacuumedVersionError) triggers :meth:`resync` instead of leaving
        the consumer permanently stuck."""
        start = self.committed()
        end = self.source.latest_version()
        if end is None or end <= start:
            return None
        try:
            batch = self.source.read_changes(start, end)
        except VacuumedVersionError:
            return self.resync()
        out = self.fold(batch)
        if self.target.latest_version() is None:
            # first batch: an empty create establishes the target schema;
            # the data itself lands in the txn-marked append below. A
            # crash between the two is safe — the rerun finds the table
            # created, no watermark committed, and replays the append.
            self.target.create(out.limit(0))
        self.target.append(out, txn_app=self.app, txn_version=end)
        return (start, end)

    def run_until_caught_up(self, max_batches: int = 1000) -> list[tuple[int, int]]:
        """Drain: run_once until the source head stops advancing."""
        out = []
        for _ in range(max_batches):
            r = self.run_once()
            if r is None:
                return out
            out.append(r)
        return out
