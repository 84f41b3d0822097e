"""Piano-roll training data pipeline (host-side numpy).

Re-architecture of guided_diffusion/pr_datasets_all.py: CSV manifests of
.npy piano rolls with onset-preserving time-stretch and pitch-shift
augmentation, rule-label extraction for classifier training, and
process-sharded infinite batch generators. No torch DataLoader — a simple
prefetching generator feeds jit'd steps plenty fast for this data shape.
"""

from __future__ import annotations

import csv
import threading
import queue as queue_mod
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import MAX_PIANO, MIN_PIANO, NORM_SCALE


def load_manifest(csv_path: str) -> Tuple[List[str], Optional[List[int]]]:
    """Read a manifest CSV with columns midi_filename[, classes]."""
    files, classes = [], []
    with open(csv_path, newline="") as f:
        reader = csv.DictReader(f)
        has_classes = "classes" in (reader.fieldnames or [])
        for row in reader:
            files.append(row["midi_filename"])
            if has_classes:
                classes.append(int(row["classes"]))
    return files, (classes if classes else None)


def piano_like_np(x: np.ndarray) -> np.ndarray:
    """Zero out (to -1) pitches outside the piano range; pitch axis == -2."""
    x[..., :MIN_PIANO, :] = -1.0
    x[..., MAX_PIANO + 1:, :] = -1.0
    return x


def key_shift(x: np.ndarray, k: int) -> np.ndarray:
    """Pitch-shift notes+onsets by k semitones via a roll; pedal untouched
    (pr_datasets_all.py:90-105)."""
    pitches_and_onsets = x[:2]
    pedals = x[2:]
    if k > 0:
        pitches_and_onsets = np.concatenate(
            [pitches_and_onsets[:, k:, :], pitches_and_onsets[:, :k, :]], axis=1
        )
    elif k < 0:
        pitches_and_onsets = np.concatenate(
            [pitches_and_onsets[:, -k:, :], pitches_and_onsets[:, :-k, :]], axis=1
        )
    out = np.concatenate([pitches_and_onsets, pedals], axis=0)
    return piano_like_np(out)


def _nearest_resize(x: np.ndarray, new_len: int) -> np.ndarray:
    """Nearest-neighbor resize along the last axis (torch 'nearest' parity)."""
    old_len = x.shape[-1]
    idx = (np.arange(new_len) * old_len // new_len).astype(np.int64)
    return x[..., idx]


def draw_stretch_params(
    t_src: int, image_size: int, rng: np.random.Generator
):
    """Sample the ±5% stretch window (pr_len, start) — split out so the
    native and numpy augmentation paths share identical draws."""
    pr_len = int(rng.uniform(0.95, 1.05) * image_size)
    pr_len = min(pr_len, t_src)
    start = int(rng.integers(0, max(t_src - pr_len, 1)))
    return pr_len, start


def time_stretch(
    arr: np.ndarray, image_size: int, rng: np.random.Generator
) -> np.ndarray:
    """±5% random time-stretch with onset preservation
    (pr_datasets_all.py:137-159).

    arr: (3, 128, T) normalized [-1, 1]. Returns (3, 128, image_size).
    """
    pr_len, start = draw_stretch_params(arr.shape[-1], image_size, rng)
    return time_stretch_with_params(arr, image_size, pr_len, start)


def time_stretch_with_params(
    arr: np.ndarray, image_size: int, pr_len: int, start: int
) -> np.ndarray:
    arr = arr[:, :, start:start + pr_len]
    if pr_len < image_size:
        # stretching: resize piano+pedal, re-place onsets w/o duplicates
        piano_pedal = _nearest_resize(arr[[0, 2]], image_size)
        onset_raw = arr[1:2]
        ind_a2b = (np.arange(image_size) / image_size * pr_len).astype(np.int64)
        ind = np.nonzero(np.diff(ind_a2b))[0] + 1
        ind = np.concatenate([[0], ind])
        onset = -np.ones((1, 128, image_size), dtype=arr.dtype)
        onset[:, :, ind] = onset_raw[:, :, :len(ind)]
        arr = np.concatenate(
            [piano_pedal[:1], onset, piano_pedal[1:]], axis=0
        )
    elif pr_len > image_size:
        # compressing: resize everything, re-add onsets that got dropped
        arr = _nearest_resize(arr, image_size)
        piano = arr[:1]
        padded = np.concatenate([piano[:, :, :1], piano], axis=-1)
        onset_online = np.diff(padded, axis=-1)
        mask = onset_online > 0
        arr[1:2][mask] = 1.0
    return arr


@dataclass
class PianoRollDataset:
    """Indexable dataset of normalized (3, 128, image_size) rolls + labels.

    Mirrors ImageDataset (pr_datasets_all.py:108-182): /63.5-1 normalize,
    optional augmentation, optional rule labels (computed via the JAX rule
    programs on single examples), process sharding files[shard::num_shards].
    """

    paths: Sequence[str]
    classes: Optional[Sequence[int]] = None
    image_size: int = 1024
    rule: Optional[str] = None
    pitch_shift: bool = True
    time_stretch: bool = True
    shard: int = 0
    num_shards: int = 1

    def __post_init__(self):
        self.paths = list(self.paths)[self.shard:][::self.num_shards]
        if self.classes is not None:
            self.classes = list(self.classes)[self.shard:][::self.num_shards]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        raw = np.load(self.paths[idx])
        # draw augmentation params up front (same rng call order as the
        # numpy path) so the native one-pass kernel is draw-for-draw
        # identical to the numpy fallback
        if self.time_stretch:
            pr_len, start = draw_stretch_params(
                raw.shape[-1], self.image_size, rng)
        else:
            pr_len, start = min(raw.shape[-1], self.image_size), 0
        k = int(rng.integers(-6, 7)) if self.pitch_shift else 0

        arr = None
        if raw.dtype == np.uint8 and raw.ndim == 3 and raw.shape[0] == 3:
            from ..native import augment_roll_native

            arr = augment_roll_native(
                raw, self.image_size, pr_len, start, k,
                do_stretch=self.time_stretch,
                min_pitch=MIN_PIANO, max_pitch=MAX_PIANO,
            )
        if arr is None:  # numpy fallback (also non-uint8/odd-shaped inputs)
            arr = raw.astype(np.float32) / NORM_SCALE - 1.0
            if self.time_stretch:
                arr = time_stretch_with_params(
                    arr, self.image_size, pr_len, start)
            else:
                arr = arr[:, :, :self.image_size]
            if arr.shape[-1] < self.image_size:
                pad = self.image_size - arr.shape[-1]
                arr = np.pad(arr, ((0, 0), (0, 0), (0, pad)),
                             constant_values=-1.0)
            if self.pitch_shift and k:
                arr = key_shift(arr, k)
            arr = piano_like_np(arr)

        out = {}
        if self.rule is not None:
            import jax.numpy as jnp

            from ..rules import chord as chord_mod
            from ..rules.registry import FUNC_DICT

            x = jnp.asarray(arr)[None]
            if "chord" in self.rule:
                # time resolution must match the rule variant: pixel rolls
                # run at fs=12.5 (16-col windows, registry.py), latent-path
                # rolls at fs=100 (128-col windows)
                fs = 12.5 if "pixel" in self.rule else 100
                tags, key_idx, _ = chord_mod.get_chords(
                    x, fs=fs, return_key=True)
                out["chord"] = np.asarray(tags)[0]
                out["key"] = np.asarray(key_idx)[0].astype(np.int64)
            else:
                out[self.rule] = np.asarray(FUNC_DICT[self.rule](x))[0]
        if self.classes is not None:
            out["y"] = np.int64(self.classes[idx])
        return arr, out


def load_data(
    *,
    data_dir: str,
    batch_size: int,
    class_cond: bool = False,
    deterministic: bool = False,
    image_size: int = 1024,
    rule: Optional[str] = None,
    shard: int = 0,
    num_shards: int = 1,
    seed: int = 0,
    prefetch: int = 2,
) -> Iterator[Tuple[np.ndarray, dict]]:
    """Infinite generator of (batch (B,3,128,L), cond dict) pairs
    (pr_datasets_all.py:26-87 contract)."""
    if batch_size < 1:
        raise ValueError(
            f"batch_size must be >= 1, got {batch_size} (a zero batch "
            f"makes the loader spin forever)"
        )
    files, classes = load_manifest(data_dir)
    if not class_cond:
        classes = None
    dataset = PianoRollDataset(
        paths=files,
        classes=classes,
        image_size=image_size,
        rule=rule,
        pitch_shift=not deterministic,
        time_stretch=not deterministic,
        shard=shard,
        num_shards=num_shards,
    )
    if len(dataset) == 0:
        raise ValueError(f"empty dataset from manifest {data_dir}")

    def batches():
        rng = np.random.default_rng(seed + shard)
        order = np.arange(len(dataset))
        while True:
            if not deterministic:
                rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idxs = order[i:i + batch_size]
                items = [dataset.__getitem__(j, rng) for j in idxs]
                batch = np.stack([it[0] for it in items])
                cond = {}
                for key in items[0][1]:
                    cond[key] = np.stack([it[1][key] for it in items])
                yield batch, cond

    if prefetch <= 0:
        yield from batches()
        return

    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)

    def producer():
        for item in batches():
            q.put(item)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        yield q.get()
