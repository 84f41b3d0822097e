"""Fréchet Audio Distance between two MIDI sets.

Reference parity: music_evaluation/fad.py + convert_to_wav.py. Uses the
full fluidsynth+VGGish stack when available (--backend vggish, needs wav
dirs rendered via eval/fad.midi_dir_to_wav), otherwise the in-environment
proxy (additive synthesis + log-mel Fréchet, eval/fad.compute_fad_proxy —
relative comparisons only, not calibrated to published FAD numbers).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--background_dir", required=True,
                        help="directory of reference .midi files")
    parser.add_argument("--eval_dir", required=True,
                        help="directory of generated .midi files")
    parser.add_argument("--backend", default="proxy",
                        choices=["proxy", "vggish"])
    parser.add_argument("--max_files", type=int, default=200)
    args = parser.parse_args()

    if args.backend == "vggish":
        from rule_guided_music_tpu.eval.fad import compute_fad

        score = compute_fad(args.background_dir, args.eval_dir)
    else:
        from rule_guided_music_tpu.eval.fad import compute_fad_proxy

        def midis(d):
            out = sorted(
                glob.glob(os.path.join(d, "*.mid"))
                + glob.glob(os.path.join(d, "*.midi"))
            )[:args.max_files]
            if len(out) < 2:
                raise SystemExit(f"need at least 2 MIDI files in {d}")
            return out

        score = compute_fad_proxy(midis(args.background_dir),
                                  midis(args.eval_dir))
    print(f"FAD ({args.backend}): {score:.4f}")


if __name__ == "__main__":
    main()
