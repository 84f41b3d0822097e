"""Note-density edit bin accuracy (reference: scripts/eval_results/edit_*.py).

For an edit run's results.csv, compute how often the generated excerpt's
note-density class landed in the target bin (and within ±1 bin), per axis.
"""

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import pandas as pd

from rule_guided_music_tpu.rules.tensor_rules import (
    HORIZONTAL_ND_BOUNDS,
    VERTICAL_ND_BOUNDS,
)


def to_classes(values, bounds):
    return np.searchsorted(np.asarray(bounds), np.asarray(values))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", required=True, help="edit results.csv")
    parser.add_argument("--rule", default="note_density")
    parser.add_argument("--hr_scale", type=float, default=1.0)
    args = parser.parse_args()

    df = pd.read_csv(args.results)
    tgt_col = f"{args.rule}.target_rule"
    gen_col = f"{args.rule}.gen_rule"
    if tgt_col not in df.columns:
        raise SystemExit(f"no column {tgt_col} in {args.results}")

    hits = near = total = 0
    for _, row in df.iterrows():
        tgt = np.asarray(ast.literal_eval(str(row[tgt_col])), dtype=float)
        gen = np.asarray(ast.literal_eval(str(row[gen_col])), dtype=float)
        half = len(tgt) // 2
        vt_t = to_classes(tgt[:half], VERTICAL_ND_BOUNDS)
        vt_g = to_classes(gen[:half], VERTICAL_ND_BOUNDS)
        hr_bounds = np.asarray(HORIZONTAL_ND_BOUNDS) / args.hr_scale
        hr_t = to_classes(tgt[half:], hr_bounds)
        hr_g = to_classes(gen[half:], hr_bounds)
        t_cls = np.concatenate([vt_t, hr_t])
        g_cls = np.concatenate([vt_g, hr_g])
        hits += int((t_cls == g_cls).sum())
        near += int((np.abs(t_cls - g_cls) <= 1).sum())
        total += len(t_cls)

    print(f"bin accuracy:   {hits / total:.3f} ({hits}/{total})")
    print(f"±1-bin accuracy: {near / total:.3f} ({near}/{total})")


if __name__ == "__main__":
    main()
