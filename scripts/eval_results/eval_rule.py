"""Aggregate rule-loss tables across methods.

Re-architecture of scripts/eval_results/eval_rule.py: walks a results root,
reads each method's results.csv and tabulates mean/std of every .loss column.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import pandas as pd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="loggings/cond_demo")
    parser.add_argument("--out", default="rule_table.csv")
    args = parser.parse_args()

    rows = []
    for dirpath, _, files in os.walk(args.root):
        if "results.csv" not in files:
            continue
        df = pd.read_csv(os.path.join(dirpath, "results.csv"))
        method = os.path.relpath(dirpath, args.root)
        row = {"method": method, "n": len(df)}
        for col in [c for c in df.columns if c.endswith(".loss")]:
            row[col + ".mean"] = df[col].mean()
            row[col + ".std"] = df[col].std()
        rows.append(row)
    table = pd.DataFrame(rows)
    table.to_csv(args.out, index=False)
    print(table.to_string(index=False))


if __name__ == "__main__":
    main()
