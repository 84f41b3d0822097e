"""Concatenate per-folder results tables into one summary.

Intent parity with the reference scripts/eval_results/eval_uncond_summary.py:
collect every ``results_mean.csv`` / ``results_std.csv`` under a root
(recursively) and write sorted ``summary_mean.csv`` / ``summary_std.csv``.
"""

import argparse
import glob
import os

import pandas as pd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_folder", default="loggings/eval_uncond/")
    args = parser.parse_args()

    for stat_type in ("mean", "std"):
        files = glob.glob(
            os.path.join(args.path_to_folder, "**", f"results_{stat_type}.csv"),
            recursive=True,
        )
        if not files:
            print(f"no results_{stat_type}.csv under {args.path_to_folder}")
            continue
        merged = pd.concat(
            (pd.read_csv(f) for f in sorted(files)), ignore_index=True
        ).sort_values(by=["dataset", "method"])
        out = os.path.join(args.path_to_folder, f"summary_{stat_type}.csv")
        merged.to_csv(out, index=False)
        print(f"wrote {out} ({len(merged)} rows from {len(files)} folders)")


if __name__ == "__main__":
    main()
