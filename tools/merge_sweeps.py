#!/usr/bin/env python
"""Merge per-preset sweep artifacts into one SWEEP JSON with a complete
summary block per preset (the round-2 VERDICT item 2 deliverable shape).

Usage: python tools/merge_sweeps.py OUT.json IN1.json [IN2.json ...]
Later inputs win on preset collisions.  Summaries are recomputed from the
rows, so partially-flushed inputs merge correctly.
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
    all_rows = {}
    for path in inputs:
        with open(path) as fh:
            d = json.load(fh)
        for preset, rows in d.get("rows", {}).items():
            all_rows[preset] = rows
    summary = {p: summarize(r) for p, r in all_rows.items()}
    with open(out_file, "w") as fh:
        json.dump({"summary": summary, "rows": all_rows}, fh, indent=1)
    print(json.dumps({"sweep": summary}))


if __name__ == "__main__":
    main()
