"""Pivot per-run mgeval CSVs into per-folder results tables.

Intent parity with the reference scripts/eval_results/eval_uncond.py:
scan a folder of ``<dataset>.<method>.<mean|std>.csv`` files (written by
eval_quality.py --runs N), extract one metric (OA or KL) per attribute,
and write sorted ``results_mean.csv`` / ``results_std.csv``.
"""

import argparse
import glob
import os
from collections import defaultdict

import pandas as pd

ATTRIBUTES = [
    "total_used_pitch", "avg_IOI", "total_pitch_class_histogram",
    "pitch_range", "mean_note_velocity", "mean_note_duration",
    "note_density", "avg",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_folder", required=True,
                        help="folder containing <dataset>.<method>.<mean|std>.csv")
    parser.add_argument("--metric", default="OA", choices=["OA", "KL"])
    args = parser.parse_args()

    results = {"mean": defaultdict(list), "std": defaultdict(list)}
    for path in sorted(glob.glob(os.path.join(args.path_to_folder, "*.csv"))):
        name = os.path.basename(path)
        parts = name.split(".")
        if len(parts) != 4 or parts[2] not in results:
            continue  # results_mean.csv etc.
        dataset, method, stat_type = parts[0], parts[1], parts[2]
        df = pd.read_csv(path)
        bucket = results[stat_type]
        bucket["dataset"].append(dataset)
        bucket["method"].append(method)
        for attr in ATTRIBUTES:
            rows = df[df.attribute == attr][args.metric]
            bucket[attr].append(rows.item() if len(rows) else float("nan"))

    for stat_type, bucket in results.items():
        if not bucket:
            continue
        out = pd.DataFrame(bucket).sort_values(by=["dataset", "method"])
        path = os.path.join(args.path_to_folder, f"results_{stat_type}.csv")
        out.to_csv(path, index=False)
        print(f"wrote {path}")
        print(out.to_string(index=False))


if __name__ == "__main__":
    main()
