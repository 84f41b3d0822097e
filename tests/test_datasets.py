"""Data pipeline tests: manifests, augmentation, batching, sharding."""

import csv
import os

import numpy as np
import pytest

from rule_guided_music_tpu.data.datasets import (
    PianoRollDataset,
    key_shift,
    load_data,
    load_manifest,
    time_stretch,
)


@pytest.fixture
def dataset_dir(tmp_path):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(6):
        roll = np.zeros((3, 128, 1280), dtype=np.uint8)
        pitch = 60 + i
        roll[0, pitch, :640] = 90
        roll[1, pitch, 0] = 127
        roll[2, 21:109, 100] = 72
        path = tmp_path / f"seq{i}.npy"
        np.save(path, roll)
        paths.append(str(path))
    csv_path = tmp_path / "train.csv"
    with open(csv_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["midi_filename", "classes"])
        for i, p in enumerate(paths):
            writer.writerow([p, i % 3])
    return str(csv_path), paths


def test_load_manifest(dataset_dir):
    csv_path, paths = dataset_dir
    files, classes = load_manifest(csv_path)
    assert files == paths
    assert classes == [0, 1, 2, 0, 1, 2]


def test_key_shift_rolls_notes_not_pedal():
    x = np.full((3, 128, 4), -1.0, dtype=np.float32)
    x[0, 60, :] = 0.5
    x[1, 60, 0] = 1.0
    x[2, 21:109, :] = 0.2
    out = key_shift(x.copy(), 2)
    assert out[0, 58, 0] == 0.5      # roll k>0 shifts pitches down-index
    assert out[0, 60, 0] == -1.0
    assert out[2, 60, 0] == pytest.approx(0.2)  # pedal untouched


def test_time_stretch_preserves_onsets():
    rng = np.random.default_rng(3)
    arr = np.full((3, 128, 1280), -1.0, dtype=np.float32)
    arr[0, 60, 100:300] = 0.5
    arr[1, 60, 100] = 1.0
    out = time_stretch(arr, 1024, rng)
    assert out.shape == (3, 128, 1024)
    # onset channel stays sparse: roughly one onset survives
    onsets = (out[1] > 0).sum()
    assert onsets <= 3


def test_dataset_item_and_labels(dataset_dir):
    csv_path, paths = dataset_dir
    files, classes = load_manifest(csv_path)
    ds = PianoRollDataset(paths=files, classes=classes, image_size=1024,
                          pitch_shift=False, time_stretch=False)
    arr, cond = ds[0]
    assert arr.shape == (3, 128, 1024)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    assert cond["y"] == 0


def test_dataset_sharding(dataset_dir):
    csv_path, paths = dataset_dir
    files, classes = load_manifest(csv_path)
    ds0 = PianoRollDataset(paths=files, classes=classes, shard=0, num_shards=2)
    ds1 = PianoRollDataset(paths=files, classes=classes, shard=1, num_shards=2)
    assert len(ds0) == 3 and len(ds1) == 3
    assert set(ds0.paths).isdisjoint(ds1.paths)


def test_load_data_generator(dataset_dir):
    csv_path, _ = dataset_dir
    gen = load_data(data_dir=csv_path, batch_size=2, class_cond=True,
                    image_size=1024, prefetch=0, deterministic=True)
    batch, cond = next(gen)
    assert batch.shape == (2, 3, 128, 1024)
    assert cond["y"].shape == (2,)
    batch2, _ = next(gen)
    assert batch2.shape == (2, 3, 128, 1024)


def test_load_data_with_rule_labels(dataset_dir):
    csv_path, _ = dataset_dir
    gen = load_data(data_dir=csv_path, batch_size=2, class_cond=False,
                    image_size=1024, rule="note_density", prefetch=0,
                    deterministic=True)
    batch, cond = next(gen)
    assert cond["note_density"].shape == (2, 16)


def test_composer_clusters():
    from rule_guided_music_tpu.data.composer_clusters import (
        NUM_COMPOSER_CLUSTERS,
        cluster_for,
    )

    assert NUM_COMPOSER_CLUSTERS == 9
    assert cluster_for("Johann Sebastian Bach") == 0
    assert cluster_for("Frédéric Chopin") == 3
    assert cluster_for("Igor Stravinsky") == 8
    assert cluster_for("Unknown Person") is None


def test_native_augment_matches_numpy_exactly(tmp_path):
    """The one-pass C++ augmentation kernel must be bit-identical to the
    numpy path for every branch (stretch / compress / equal / plain crop)
    and every pitch shift."""
    from rule_guided_music_tpu.constants import MAX_PIANO, MIN_PIANO, NORM_SCALE
    from rule_guided_music_tpu.data.datasets import (
        key_shift,
        piano_like_np,
        time_stretch_with_params,
    )
    from rule_guided_music_tpu.native import augment_roll_native, is_available

    if not is_available():
        pytest.skip("native codec unavailable")

    rng = np.random.default_rng(0)
    raw = np.zeros((3, 128, 300), dtype=np.uint8)
    for _ in range(60):
        p = rng.integers(21, 109)
        s = rng.integers(0, 280)
        d = rng.integers(3, 30)
        raw[0, p, s:s + d] = rng.integers(30, 120)
        raw[1, p, s] = 127
        raw[2, p, s:s + d] = rng.integers(0, 128)

    image = 256
    cases = [
        (230, 12, 3, True),     # stretch (pr_len < image)
        (290, 5, -4, True),     # compress (pr_len > image)
        (256, 10, 6, True),     # equal
        (256, 0, 0, False),     # plain crop, no shift
        (140, 100, -6, True),   # strong stretch + max shift
    ]
    for pr_len, start, k, do_stretch in cases:
        got = augment_roll_native(
            raw, image, pr_len, start, k, do_stretch=do_stretch,
            min_pitch=MIN_PIANO, max_pitch=MAX_PIANO,
        )
        arr = raw.astype(np.float32) / NORM_SCALE - 1.0
        if do_stretch:
            arr = time_stretch_with_params(arr, image, pr_len, start)
        else:
            arr = arr[:, :, :image]
        if arr.shape[-1] < image:
            arr = np.pad(arr, ((0, 0), (0, 0), (0, image - arr.shape[-1])),
                         constant_values=-1.0)
        if k:
            arr = key_shift(arr, k)
        want = piano_like_np(arr)
        np.testing.assert_array_equal(
            got, want.astype(np.float32),
            err_msg=f"case pr_len={pr_len} start={start} k={k} "
                    f"stretch={do_stretch}",
        )


def test_dataset_native_and_fallback_agree(tmp_path):
    """PianoRollDataset must yield the same item whether the native kernel
    or the numpy fallback runs (same rng draws)."""
    from rule_guided_music_tpu.data.datasets import PianoRollDataset
    from rule_guided_music_tpu.native import is_available

    if not is_available():
        pytest.skip("native codec unavailable")

    rng = np.random.default_rng(1)
    raw = np.zeros((3, 128, 400), dtype=np.uint8)
    for _ in range(40):
        p = rng.integers(30, 100)
        s = rng.integers(0, 380)
        raw[0, p, s:s + 10] = 80
        raw[1, p, s] = 127
    path_u8 = tmp_path / "u8.npy"
    np.save(path_u8, raw)
    path_f32 = tmp_path / "f32.npy"   # float input forces the numpy path
    np.save(path_f32, raw.astype(np.float32))

    ds_u8 = PianoRollDataset(paths=[str(path_u8)], image_size=256)
    ds_f32 = PianoRollDataset(paths=[str(path_f32)], image_size=256)
    a, _ = ds_u8.__getitem__(0, rng=np.random.default_rng(7))
    b, _ = ds_f32.__getitem__(0, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pixel_chord_rule_labels_use_pixel_resolution(tmp_path):
    """chord_progression_pixel labels must be computed at fs=12.5 (16-col
    windows -> 8 tags on a 128-col roll), not the latent path's fs=100
    (which would yield a single whole-roll tag)."""
    from rule_guided_music_tpu.data.datasets import PianoRollDataset

    raw = np.zeros((3, 128, 128), dtype=np.uint8)
    for w in range(8):
        for p in (60, 64, 67):
            raw[0, p, w * 16:(w + 1) * 16] = 80
            raw[1, p, w * 16] = 127
    path = tmp_path / "roll.npy"
    np.save(path, raw)

    ds = PianoRollDataset(paths=[str(path)], image_size=128,
                          rule="chord_progression_pixel",
                          pitch_shift=False, time_stretch=False)
    _, labels = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert labels["chord"].shape == (8,), labels["chord"].shape

    ds_latent = PianoRollDataset(paths=[str(path)], image_size=128,
                                 rule="chord_progression",
                                 pitch_shift=False, time_stretch=False)
    _, labels_l = ds_latent.__getitem__(0, rng=np.random.default_rng(0))
    assert labels_l["chord"].shape == (1,), labels_l["chord"].shape
