"""Model-based check of SnapshotTable: a random but SEEDED sequence of
append / merge / delete / rename / widen / compact / zorder ops runs
against both the table and a plain in-memory dict model; after every op
the table must read back exactly the model (and version history must
replay to each recorded model state). This is the test shape that
catches protocol interactions no single-feature test covers —
rename-then-merge-on-renamed-key, widen-then-compact, delete after
zorder, etc.
"""

from __future__ import annotations

import random

import pytest

from wopen_spark.snapshot_table import (
    BlobDataStore,
    InMemoryLogStore,
    SnapshotTable,
)

N_OPS = 24


def _expected_rows(model: dict[int, tuple]) -> list[tuple]:
    return sorted(model.items())


def _read_back(table, id_col, val_col) -> list[tuple]:
    return sorted(
        (r[id_col], (r[val_col], r["x"])) for r in table.read().collect()
    )


# stores=None -> local log + local data; "inmem" -> in-memory log,
# local data; "blob" -> in-memory log AND blob data store — the fully
# rename-free, directory-free combination where any POSIX dependence
# left in the table protocol fails loudly.
@pytest.mark.parametrize("seed,stores", [(7, None), (23, "inmem"), (31, "blob")])
def test_snapshot_random_op_sequence_matches_model(spark, tmp_path, seed, stores):
    rng = random.Random(seed)
    table = SnapshotTable(
        spark, str(tmp_path / "tbl"),
        log_store=InMemoryLogStore() if stores else None,
        data_store=(
            BlobDataStore(str(tmp_path / "scratch")) if stores == "blob" else None
        ),
    )
    # schema starts narrow on purpose: x is int and may widen to long
    val_col = "v"
    model: dict[int, tuple] = {1: ("a", 1), 2: ("b", 2)}
    table.create(
        spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in model.items()],
            "id long, v string, x int",
        ).coalesce(1),
        cluster_by=["id"],
    )
    history: list[tuple[int, list[tuple]]] = [
        (table.latest_version(), _expected_rows(model))
    ]
    next_id = 10
    widened = False

    for step in range(N_OPS):
        op = rng.choice(
            ["append", "append", "merge", "delete", "rename", "widen",
             "compact", "zorder"]
        )
        if op == "append":
            rows = [
                (next_id + i, f"s{step}", (next_id + i) % 97)
                for i in range(rng.randint(1, 4))
            ]
            for k, s, x in rows:
                model[k] = (s, x)
            next_id += len(rows)
            table.append(
                spark.createDataFrame(
                    [(k, s, x) for k, s, x in rows],
                    f"id long, {val_col} string, x {'long' if widened else 'int'}",
                ).coalesce(1)
            )
        elif op == "merge":
            keys = rng.sample(sorted(model), min(2, len(model)))
            extra = next_id
            next_id += 1
            rows = [(k, f"M{step}", model[k][1]) for k in keys] + [
                (extra, f"M{step}", 0)
            ]
            for k, s, x in rows:
                model[k] = (s, x)
            table.merge(
                spark.createDataFrame(
                    rows, f"id long, {val_col} string, x {'long' if widened else 'int'}"
                ),
                "id",
            )
        elif op == "delete":
            if len(model) > 2:
                victim = rng.choice(sorted(model))
                del model[victim]
                table.delete_where(f"id = {victim}")
        elif op == "rename":
            new = f"{val_col}_r{step}"
            table.rename_column(val_col, new)
            val_col = new
        elif op == "widen" and not widened:
            # a wider append evolves x: int -> long for the whole table
            big = 2**40 + step
            model[next_id] = (f"W{step}", big)
            table.append(
                spark.createDataFrame(
                    [(next_id, f"W{step}", big)],
                    f"id long, {val_col} string, x long",
                ).coalesce(1)
            )
            next_id += 1
            widened = True
        elif op == "compact":
            table.compact(target_files=2)
        elif op == "zorder":
            table.optimize_zorder(["id", "x"], target_files=4, bits_per_col=3)

        assert _read_back(table, "id", val_col) == _expected_rows(model), (
            f"divergence after step {step} ({op})"
        )
        history.append((table.latest_version(), _expected_rows(model)))

    # time travel: every recorded version still reads as its model state.
    # Column NAMES at old versions are historical; compare id + x (x may
    # read wider post-widening — compare values, not dtypes).
    for version, expected in history[-6:]:
        got = sorted(
            (r["id"], r["x"]) for r in table.read(version=version).collect()
        )
        assert got == sorted((k, v[1]) for k, v in expected), version
