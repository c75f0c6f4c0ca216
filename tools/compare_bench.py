"""Compare a fresh bench.py JSON line against a regression base's
markdown cell table: prints total movement and any per-query movers
beyond a ratio threshold (default 2x), ignoring sub-second cells where
ratios are noise.

Usage: python tools/compare_bench.py BENCH_SF01.md fresh.json [--ratio 2]
The markdown table rows are ``| query | sec |``; the JSON is bench.py's
single line (``{"queries": {...}}``).
"""
from __future__ import annotations

import json
import re
import sys


def parse_base(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for line in open(path):
        m = re.match(r"^\|\s*([A-Za-z_]\w*)\s*\|\s*([0-9.]+)\s*\|\s*$", line)
        if m:
            # keep the FIRST occurrence (the main campaign table);
            # later isolated-run sections re-list a few cells
            out.setdefault(m.group(1), float(m.group(2)))
    return out


def main() -> None:
    base_path, fresh_path = sys.argv[1], sys.argv[2]
    ratio = 2.0
    if "--ratio" in sys.argv:
        ratio = float(sys.argv[sys.argv.index("--ratio") + 1])
    base = parse_base(base_path)
    fresh_doc = json.loads(open(fresh_path).read())
    fresh = fresh_doc["queries"] if "queries" in fresh_doc else fresh_doc
    common = sorted(set(base) & set(fresh))
    movers = []
    for q in common:
        b, f = base[q], fresh[q]
        if min(b, f) < 1.0:
            continue  # sub-second cells: ratio is noise
        r = f / b
        if r >= ratio or r <= 1 / ratio:
            movers.append((r, q, b, f))
    print(
        json.dumps(
            {
                "common_cells": len(common),
                "base_total_common": round(sum(base[q] for q in common), 1),
                "fresh_total_common": round(sum(fresh[q] for q in common), 1),
                "new_cells": sorted(set(fresh) - set(base)),
                "dropped_cells": sorted(set(base) - set(fresh)),
                "movers": [
                    {"query": q, "base": b, "fresh": f, "ratio": round(r, 2)}
                    for r, q, b, f in sorted(movers, reverse=True)
                ],
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
