"""Fréchet Audio Distance hookup (reference: music_evaluation/fad.py).

The reference renders MIDI to wav with fluidsynth and scores FAD with the
``frechet_audio_distance`` package (VGGish). Neither fluidsynth nor that
package ships in this environment, so this module provides the same API
surface with explicit gating: it computes FAD when the dependencies exist
and raises a clear error otherwise.
"""

from __future__ import annotations

import os
from typing import Sequence


def _require(module: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise RuntimeError(
            f"FAD evaluation needs '{module}' (and a fluidsynth soundfont); "
            "install it in a full environment to enable this metric."
        ) from e


def midi_dir_to_wav(midi_dir: str, wav_dir: str, soundfont: str,
                    sample_rate: int = 16000) -> Sequence[str]:
    """Render .midi files to .wav via fluidsynth (convert_to_wav.py parity)."""
    import subprocess

    os.makedirs(wav_dir, exist_ok=True)
    out = []
    for fname in sorted(os.listdir(midi_dir)):
        if not fname.endswith((".mid", ".midi")):
            continue
        wav = os.path.join(wav_dir, os.path.splitext(fname)[0] + ".wav")
        subprocess.run(
            ["fluidsynth", "-ni", soundfont, os.path.join(midi_dir, fname),
             "-F", wav, "-r", str(sample_rate)],
            check=True, capture_output=True,
        )
        out.append(wav)
    return out


def compute_fad(background_dir: str, eval_dir: str) -> float:
    """FAD between two wav directories (fad.py:12-38 parity)."""
    fad_mod = _require("frechet_audio_distance")
    fad = fad_mod.FrechetAudioDistance(
        model_name="vggish", use_pca=False, use_activation=False,
    )
    return float(fad.score(background_dir, eval_dir))
