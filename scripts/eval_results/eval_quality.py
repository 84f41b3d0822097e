"""mgeval-style quality tables: generated vs reference MIDI sets.

Re-architecture of the reference's eval_rule_quality.py over this
framework's mgeval port. With ``--runs > 1`` it mirrors the reference
music_evaluator multi-run protocol: repeated random subsamples of both
sets, per-attribute mean/std over runs, written as
``<dataset>.<method>.mean.csv`` / ``<dataset>.<method>.std.csv`` (the file
naming eval_uncond.py aggregates; reference eval_uncond.py:23-33).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import pandas as pd

from rule_guided_music_tpu.eval.mgeval import (
    ATTRIBUTE_ALIASES,
    evaluate_sets,
    write_report,
)


def _rows(results):
    out = []
    for feature, stats in results.items():
        out.append({
            "attribute": ATTRIBUTE_ALIASES.get(feature, feature),
            "KL": stats["kl_divergence"],
            "OA": stats["overlap_area"],
        })
    out.append({
        "attribute": "avg",
        "KL": float(np.mean([r["KL"] for r in out])),
        "OA": float(np.mean([r["OA"] for r in out])),
    })
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--generated_dir", required=True)
    parser.add_argument("--reference_dir", required=True)
    parser.add_argument("--out", default="quality")
    parser.add_argument("--max_files", type=int, default=200)
    parser.add_argument("--runs", type=int, default=1,
                        help="multi-run protocol: subsample both sets this "
                             "many times and report per-attribute mean/std")
    parser.add_argument("--subsample", type=int, default=0,
                        help="files per set per run (0 = max_files)")
    parser.add_argument("--dataset", default="",
                        help="dataset tag for <dataset>.<method>.*.csv")
    parser.add_argument("--method", default="",
                        help="method tag for <dataset>.<method>.*.csv")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    gen = sorted(glob.glob(os.path.join(args.generated_dir, "*.mid*")))
    ref = sorted(glob.glob(os.path.join(args.reference_dir, "*.mid*")))
    gen, ref = gen[:args.max_files], ref[:args.max_files]
    if len(gen) < 2 or len(ref) < 2:
        raise SystemExit("need at least 2 files per set")

    if args.runs <= 1:
        results = evaluate_sets(gen, ref)
        write_report(results, args.out + "_statistics.txt")
        rows = [{"feature": k, **v} for k, v in results.items()]
        pd.DataFrame(rows).to_csv(args.out + ".csv", index=False)
        print(pd.DataFrame(rows).to_string(index=False))
        return

    rng = np.random.default_rng(args.seed)
    size = args.subsample or min(len(gen), len(ref))
    per_run = []
    for _ in range(args.runs):
        g = list(rng.choice(gen, size=min(size, len(gen)), replace=False))
        r = list(rng.choice(ref, size=min(size, len(ref)), replace=False))
        per_run.append(pd.DataFrame(_rows(evaluate_sets(g, r))))
    stacked = pd.concat(per_run)
    mean = stacked.groupby("attribute", sort=False).mean().reset_index()
    std = stacked.groupby("attribute", sort=False).std().reset_index()

    dataset = args.dataset or os.path.basename(
        os.path.normpath(args.reference_dir))
    method = args.method or os.path.basename(
        os.path.normpath(args.generated_dir))
    out_dir = os.path.dirname(args.out) or "."
    os.makedirs(out_dir, exist_ok=True)
    if os.path.basename(args.out) not in ("", "quality"):
        print(f"note: multi-run mode names files <dataset>.<method>.*.csv "
              f"(eval_uncond.py layout); the --out basename "
              f"{os.path.basename(args.out)!r} only selects the directory")
    for tag, df in [("mean", mean), ("std", std)]:
        path = os.path.join(out_dir, f"{dataset}.{method}.{tag}.csv")
        df.to_csv(path, index=False)
        print(f"wrote {path}")
    print(mean.to_string(index=False))


if __name__ == "__main__":
    main()
