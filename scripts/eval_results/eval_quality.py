"""mgeval-style quality tables: generated vs reference MIDI sets.

Re-architecture of scripts/eval_results/eval_rule_quality.py /
eval_uncond*.py over the framework's own mgeval port.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import pandas as pd

from rule_guided_music_tpu.eval.mgeval import evaluate_sets, write_report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--generated_dir", required=True)
    parser.add_argument("--reference_dir", required=True)
    parser.add_argument("--out", default="quality")
    parser.add_argument("--max_files", type=int, default=200)
    args = parser.parse_args()

    gen = sorted(glob.glob(os.path.join(args.generated_dir, "*.mid*")))
    ref = sorted(glob.glob(os.path.join(args.reference_dir, "*.mid*")))
    gen, ref = gen[:args.max_files], ref[:args.max_files]
    if len(gen) < 2 or len(ref) < 2:
        raise SystemExit("need at least 2 files per set")

    results = evaluate_sets(gen, ref)
    write_report(results, args.out + "_statistics.txt")
    rows = [{"feature": k, **v} for k, v in results.items()]
    pd.DataFrame(rows).to_csv(args.out + ".csv", index=False)
    print(pd.DataFrame(rows).to_string(index=False))


if __name__ == "__main__":
    main()
