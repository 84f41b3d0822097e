"""Recompute rule values from saved MIDI files.

Re-architecture of scripts/eval_results/compute_rule.py: reparses generated
.midi files back into rolls and evaluates the rule programs on them — the
multiprocessing pool becomes a single batched device call.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax.numpy as jnp
import numpy as np
import pandas as pd

from rule_guided_music_tpu.constants import EXCERPT_COLS, NORM_SCALE
from rule_guided_music_tpu.data.midi_io import read_midi
from rule_guided_music_tpu.data.pianoroll import midi_to_roll
from rule_guided_music_tpu.rules.registry import FUNC_DICT


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--midi_dir", required=True)
    parser.add_argument("--rules", nargs="+",
                        default=["pitch_hist", "note_density",
                                 "chord_progression"])
    parser.add_argument("--length", type=int, default=EXCERPT_COLS)
    parser.add_argument("--out", default="computed_rules.csv")
    args = parser.parse_args()

    files = sorted(glob.glob(os.path.join(args.midi_dir, "*.midi")) +
                   glob.glob(os.path.join(args.midi_dir, "*.mid")))
    rolls = []
    for path in files:
        roll = midi_to_roll(read_midi(path), length=args.length)
        rolls.append(roll.astype(np.float32) / NORM_SCALE - 1.0)
    batch = jnp.asarray(np.stack(rolls))

    results = {"file": [os.path.basename(f) for f in files]}
    for rule in args.rules:
        vals = np.asarray(FUNC_DICT[rule](batch))
        results[rule] = vals.tolist()
    pd.DataFrame(results).to_csv(args.out, index=False)
    print(f"wrote {args.out} ({len(files)} files)")


if __name__ == "__main__":
    main()
