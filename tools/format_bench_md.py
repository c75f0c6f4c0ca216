"""Regenerate BENCH_SF{N}.md from a bench JSON line + full per-query JSON.

Usage: python tools/format_bench_md.py <summary.json> <full.json> <out.md>
           <title> <header-note>
Keeps the regression-gate boilerplate and emits the per-query table
sorted by name (stable diffs between rounds).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    summary_path, full_path, out_path, title, note = sys.argv[1:6]
    with open(summary_path) as f:
        s = json.loads(f.read().strip().splitlines()[-1])
    with open(full_path) as f:
        full = json.load(f)
    queries = full.get("queries", full) if isinstance(full, dict) else full
    lines = [
        f"# {title}",
        "",
        note,
        "",
        f"**Total wall: {s['value']} s across {s['n_queries']} queries, "
        f"{s['errors']} errors.**",
        "",
        "Regression gate for future rounds: no query >2x its column below at the",
        "same inputs (re-time in isolation before acting on a single slow run —",
        "see memory note on bench variance).",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for name in sorted(queries):
        lines.append(f"| {name} | {queries[name]} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: {s['n_queries']} queries, total {s['value']}s")


if __name__ == "__main__":
    main()
