"""Cross-process race on the DATASOURCE commit path (r9 verdict #4):
two OS processes append through ``df.write.format("wopen_snapshot")``
against one table. The engine-class protocol is raced by
test_snapshot_race.py; this proves the datasource writer's own retry
loop (now with jittered backoff) holds under genuine concurrency.

Asserts, after both writers exit cleanly:
- linear history: log versions exactly 1..N, no gaps, no dupes;
- no lost appends: every row either writer committed is in the final
  table exactly once (plus the seed rows);
- no torn commits: every log json parses with a complete manifest;
- no orphans: every parquet under data/ is referenced by the log
  (aborted shards cleaned up), and no stray .bloom sidecars.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "datasource_race_worker.py")
N_APPENDS = 5


def test_two_process_datasource_writers_race_cleanly(spark, tmp_path):
    from wopen_spark.snapshot_table import SnapshotTable

    table_path = str(tmp_path / "tbl")
    table = SnapshotTable(spark, table_path)
    table.create(
        spark.createDataFrame(
            [(1, 0, 0), (2, 0, 1)], "id long, writer int, seq int"
        ).coalesce(1)
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
                str(tmp_path / f"out_{wid}.json"),
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for wid in (1, 2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    committed = []
    for wid in (1, 2):
        blob = json.load(open(tmp_path / f"out_{wid}.json"))
        assert len(blob["committed"]) == N_APPENDS
        committed.extend(blob["committed"])

    # linear, gapless, parseable history
    log_dir = os.path.join(table_path, "_log")
    versions = sorted(
        int(f[:8])
        for f in os.listdir(log_dir)
        if len(f) == 13 and f.endswith(".json") and f[:8].isdigit()
    )
    assert versions == list(range(1, 1 + 1 + 2 * N_APPENDS))
    referenced: set[str] = set()
    for v in versions:
        c = json.load(open(os.path.join(log_dir, f"{v:08d}.json")))
        assert "add" in c and "remove" in c, c
        referenced.update(m["path"] for m in c["add"])

    # every committed row exactly once
    rows = sorted(
        (r.id, r.writer, r.seq) for r in table.read().collect()
    )
    ids = [r[0] for r in rows]
    assert len(ids) == len(set(ids)), "duplicated row ids"
    assert set(ids) == {1, 2, *committed}

    # no orphan shards or sidecars on disk
    on_disk = set()
    for root, _, files in os.walk(os.path.join(table_path, "data")):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), table_path)
            on_disk.add(rel)
    stray = {
        p for p in on_disk
        if p.endswith(".parquet") and p not in referenced
    }
    assert not stray, f"orphan shards: {sorted(stray)[:5]}"
    blooms = {p for p in on_disk if p.endswith(".bloom")}
    assert blooms <= {f"{p}.bloom" for p in referenced}
