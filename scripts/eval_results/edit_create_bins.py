"""Derive note-density class bins from a dataset's extracted targets.

Intent parity with the reference scripts/eval_results/edit_create_bins.py:
read a ``results.csv`` (written by sample_rule/edit runs), pool the
vertical/horizontal note-density targets, split each into 8 equal-count
bins, and report counts + bounds. Beyond the reference (which only prints),
``--out`` writes a JSON with bounds (7 inner edges) and bin centers
(medians) in the exact format ``edit.py --nd_bins_file`` consumes, so
editing targets can be dataset-derived instead of hard-wired
(tensor_rules.py VERTICAL/HORIZONTAL_ND_BOUNDS/CENTER).
"""

import argparse
import ast
import json

import numpy as np
import pandas as pd


def create_bins(values, n_bins=8):
    data = np.sort(np.asarray(values, dtype=np.float64))
    bins = np.array_split(data, n_bins)
    counts = [len(b) for b in bins]
    bounds = [(float(b[0]), float(b[-1])) for b in bins if len(b)]
    # inner edges: midpoint between adjacent bins' extremes; centers: medians
    inner = [
        float((bins[i][-1] + bins[i + 1][0]) / 2.0)
        for i in range(len(bins) - 1)
        if len(bins[i]) and len(bins[i + 1])
    ]
    centers = [float(np.median(b)) for b in bins if len(b)]
    return counts, bounds, inner, centers


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--file_name", required=True,
                        help="results.csv with a note_density.target_rule column")
    parser.add_argument("--bins", type=int, default=8)
    parser.add_argument("--out", default="",
                        help="optional JSON path for edit.py --nd_bins_file")
    args = parser.parse_args()

    df = pd.read_csv(args.file_name)
    vertical, horizontal = [], []
    for row in df["note_density.target_rule"]:
        densities = ast.literal_eval(row)
        half = len(densities) // 2
        vertical.extend(densities[:half])
        horizontal.extend(densities[half:])

    out = {}
    for name, values in [("vertical", vertical), ("horizontal", horizontal)]:
        counts, bounds, inner, centers = create_bins(values, args.bins)
        print(f"{name.capitalize()} Note Density Bins:")
        for i, (count, b) in enumerate(zip(counts, bounds), 1):
            print(f"Bin {i} (Samples: {count}, Bounds: {b})")
        print()
        out[f"{name}_bounds"] = inner
        out[f"{name}_centers"] = centers

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
