"""mgeval-style objective evaluation of generated MIDI.

Re-architecture of music_evaluation/{music_evaluator.py, mgeval/core.py,
mgeval/utils.py}: per-file absolute features, leave-one-out intra/inter-set
distance distributions, and KL divergence + Overlap Area per feature.

Features (the 7 used by the reference evaluator, music_evaluator.py:58-106):
  total_used_pitch, pitch_range, avg_IOI, total_pitch_class_histogram,
  avg_velocity, note_length (mean duration), note_density (notes/sec).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np
from scipy import stats

from ..data.midi_io import MidiData, read_midi


# ---------------------------------------------------------------------------
# Per-file features (mgeval/core.py ports)
# ---------------------------------------------------------------------------


def total_used_pitch(midi: MidiData) -> float:
    return float(len({n.pitch for n in midi.notes}))


def pitch_range(midi: MidiData) -> float:
    if not midi.notes:
        return 0.0
    pitches = [n.pitch for n in midi.notes]
    return float(max(pitches) - min(pitches))


def avg_ioi(midi: MidiData) -> float:
    """Average inter-onset interval."""
    onsets = sorted({round(n.start, 6) for n in midi.notes})
    if len(onsets) < 2:
        return 0.0
    return float(np.mean(np.diff(onsets)))


def total_pitch_class_histogram(midi: MidiData) -> np.ndarray:
    hist = np.zeros(12)
    for n in midi.notes:
        hist[n.pitch % 12] += n.end - n.start
    s = hist.sum()
    return hist / s if s > 0 else hist


def avg_velocity(midi: MidiData) -> float:
    if not midi.notes:
        return 0.0
    return float(np.mean([n.velocity for n in midi.notes]))


def avg_note_length(midi: MidiData) -> float:
    if not midi.notes:
        return 0.0
    return float(np.mean([n.end - n.start for n in midi.notes]))


def note_density(midi: MidiData) -> float:
    end = midi.get_end_time()
    return float(len(midi.notes) / end) if end > 0 else 0.0


# This module's feature keys -> the reference music_evaluator attribute
# names (eval_uncond.py:12-21) for results-table compatibility.
ATTRIBUTE_ALIASES = {
    "avg_velocity": "mean_note_velocity",
    "note_length": "mean_note_duration",
}

FEATURES = {
    "total_used_pitch": total_used_pitch,
    "pitch_range": pitch_range,
    "avg_IOI": avg_ioi,
    "total_pitch_class_histogram": total_pitch_class_histogram,
    "avg_velocity": avg_velocity,
    "note_length": avg_note_length,
    "note_density": note_density,
}


# ---------------------------------------------------------------------------
# Distance distributions + KL / Overlap Area (mgeval/utils.py ports)
# ---------------------------------------------------------------------------


def _feature_matrix(files: Sequence[str], feature: str) -> np.ndarray:
    vals = []
    for path in files:
        midi = read_midi(path)
        vals.append(np.atleast_1d(np.asarray(FEATURES[feature](midi), dtype=float)))
    return np.stack(vals)


def c_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Euclidean distances from one sample to every sample of another set."""
    return np.linalg.norm(b - a[None], axis=-1)


def kl_dist(a: np.ndarray, b: np.ndarray, num_sample: int = 1000) -> float:
    """KL between Gaussian-KDE-smoothed distance distributions."""
    a, b = np.asarray(a, float).ravel(), np.asarray(b, float).ravel()
    if a.std() < 1e-12 or b.std() < 1e-12:
        return 0.0
    pdf_a = stats.gaussian_kde(a)
    pdf_b = stats.gaussian_kde(b)
    sample = np.linspace(
        min(a.min(), b.min()), max(a.max(), b.max()), num_sample
    )
    pa, pb = pdf_a(sample) + 1e-12, pdf_b(sample) + 1e-12
    return float(stats.entropy(pa, pb))


def overlap_area(a: np.ndarray, b: np.ndarray, num_sample: int = 1000) -> float:
    """Overlapping area of the two KDE-smoothed distributions."""
    a, b = np.asarray(a, float).ravel(), np.asarray(b, float).ravel()
    if a.std() < 1e-12 or b.std() < 1e-12:
        return 0.0
    pdf_a = stats.gaussian_kde(a)
    pdf_b = stats.gaussian_kde(b)
    lo = min(a.min(), b.min())
    hi = max(a.max(), b.max())
    sample = np.linspace(lo, hi, num_sample)
    return float(
        np.minimum(pdf_a(sample), pdf_b(sample)).sum() * (hi - lo) / num_sample
    )


def evaluate_sets(
    generated_files: Sequence[str],
    reference_files: Sequence[str],
    features: Sequence[str] = tuple(FEATURES.keys()),
) -> Dict[str, Dict[str, float]]:
    """Absolute means + relative (intra/inter) KL and OA per feature
    (music_evaluator.py:108-221)."""
    results = {}
    for feature in features:
        gen = _feature_matrix(generated_files, feature)
        ref = _feature_matrix(reference_files, feature)
        n_gen, n_ref = len(gen), len(ref)

        # leave-one-out intra-set distances for the generated set
        intra = np.array([
            c_dist(gen[i], np.delete(gen, i, axis=0)).mean()
            for i in range(n_gen)
        ])
        inter = np.array([c_dist(gen[i], ref).mean() for i in range(n_gen)])
        intra_ref = np.array([
            c_dist(ref[i], np.delete(ref, i, axis=0)).mean()
            for i in range(n_ref)
        ])

        results[feature] = {
            "gen_mean": float(gen.mean()),
            "gen_std": float(gen.std()),
            "ref_mean": float(ref.mean()),
            "ref_std": float(ref.std()),
            "kl_divergence": kl_dist(intra, inter),
            "overlap_area": overlap_area(intra, inter),
            "ref_kl_divergence": kl_dist(intra_ref, inter),
            "ref_overlap_area": overlap_area(intra_ref, inter),
        }
    return results


def write_report(results: Dict[str, Dict[str, float]], path: str):
    """statistics.txt-style report (music_evaluation/results/statistics.txt)."""
    with open(path, "w") as f:
        for feature, stats_d in results.items():
            f.write(f"{feature}:\n")
            for k, v in stats_d.items():
                f.write(f"  {k}: {v:.4f}\n")
            f.write("\n")
