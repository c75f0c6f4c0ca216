"""Operator CLI for SnapshotTable maintenance — the jobs a table owner
runs on cron: inspect history, compact small files, Z-order, vacuum,
evolve schema. One table path, one action, JSON to stdout.

Usage:
    python tools/snapshot_admin.py <table_path> history
    python tools/snapshot_admin.py <table_path> describe
    python tools/snapshot_admin.py <table_path> compact [--target-files N]
    python tools/snapshot_admin.py <table_path> zorder --cols a,b [--target-files N]
    python tools/snapshot_admin.py <table_path> vacuum [--retain-last N]
    python tools/snapshot_admin.py <table_path> rename --old a --new b
    python tools/snapshot_admin.py <table_path> drop --col a
    python tools/snapshot_admin.py <table_path> binpack [--max-file-mb N]
    python tools/snapshot_admin.py <table_path> restore --version N
    python tools/snapshot_admin.py <table_path> constraints
    python tools/snapshot_admin.py <table_path> add-constraint --name n --expr sql
    python tools/snapshot_admin.py <table_path> drop-constraint --name n
    python tools/snapshot_admin.py <table_path> set-cluster-by --cols a,b
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("table_path")
    sub = p.add_subparsers(dest="action", required=True)
    sub.add_parser("history")
    sub.add_parser("describe")
    c = sub.add_parser("compact")
    c.add_argument("--target-files", type=int, default=1)
    z = sub.add_parser("zorder")
    z.add_argument("--cols", required=True)
    z.add_argument("--target-files", type=int, default=8)
    v = sub.add_parser("vacuum")
    v.add_argument("--retain-last", type=int, default=1)
    r = sub.add_parser("rename")
    r.add_argument("--old", required=True)
    r.add_argument("--new", required=True)
    d = sub.add_parser("drop")
    d.add_argument("--col", required=True)
    b = sub.add_parser("binpack")
    b.add_argument("--max-file-mb", type=int, default=128)
    rs = sub.add_parser("restore")
    rs.add_argument("--version", type=int, required=True)
    sub.add_parser("constraints")
    ac = sub.add_parser("add-constraint")
    ac.add_argument("--name", required=True)
    ac.add_argument("--expr", required=True)
    dc = sub.add_parser("drop-constraint")
    dc.add_argument("--name", required=True)
    sc = sub.add_parser("set-cluster-by")
    sc.add_argument("--cols", required=True)
    m = sub.add_parser("maintain")
    m.add_argument("--small-file-mb", type=int, default=128)
    m.add_argument("--min-small-files", type=int, default=8)
    m.add_argument("--vacuum-retain-last", type=int, default=None)
    return p


def run(args: argparse.Namespace, spark=None) -> dict:
    """Dispatch one admin action; returns the JSON-able report (the CLI
    prints it). ``spark`` is injectable so tests reuse their session."""
    from wopen_spark.snapshot_table import SnapshotTable

    if spark is None:
        from wopen_spark.session import get_spark

        spark = get_spark("snapshot-admin")
    t = SnapshotTable(spark, args.table_path)
    if args.action == "history":
        return {"history": t.history()}
    if args.action == "describe":
        state = t._state()
        return {
            "version": state["version"],
            "n_files": len(state["files"]),
            "bytes": sum(m.get("bytes", 0) for m in state["files"].values()),
            "rows": sum(m.get("rows", 0) for m in state["files"].values()),
            "schema": [
                f"{f['name']}:{f['type'] if isinstance(f['type'], str) else 'complex'}"
                for f in state["schema"]["fields"]
            ],
            "cluster_by": state["cluster_by"],
            "column_mapping": state["column_mapping"] or {},
            "constraints": state["constraints"],
            "generated": state["generated"],
            "n_dv_masked_files": len(state["dvs"]),
        }
    if args.action == "compact":
        return t.compact(target_files=args.target_files)
    if args.action == "zorder":
        return t.optimize_zorder(
            args.cols.split(","), target_files=args.target_files
        )
    if args.action == "vacuum":
        return {"files_deleted": t.vacuum(retain_last=args.retain_last)}
    if args.action == "rename":
        return {"version": t.rename_column(args.old, args.new)}
    if args.action == "drop":
        return {"version": t.drop_column(args.col)}
    if args.action == "binpack":
        return t.optimize_small_files(
            max_file_bytes=args.max_file_mb * (1 << 20)
        )
    if args.action == "restore":
        return {"version": t.restore(args.version)}
    if args.action == "constraints":
        return {"constraints": t.constraints(), "generated": t.generated_columns()}
    if args.action == "add-constraint":
        return {"version": t.add_constraint(args.name, args.expr)}
    if args.action == "drop-constraint":
        return {"version": t.drop_constraint(args.name)}
    if args.action == "set-cluster-by":
        return {"version": t.set_cluster_by(args.cols.split(","))}
    if args.action == "maintain":
        return t.maintain(
            small_file_bytes=args.small_file_mb * (1 << 20),
            min_small_files=args.min_small_files,
            vacuum_retain_last=args.vacuum_retain_last,
        )
    raise SystemExit(f"unknown action {args.action}")


def main() -> int:
    args = build_parser().parse_args()
    print(json.dumps(run(args)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
