"""ctypes bindings for the native roll codec (roll_codec.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "roll_codec.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
# outside the package import path so pkgutil walkers don't try to import it
_SO = os.path.join(_BUILD_DIR, "libroll_codec.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.extract_notes.restype = ctypes.c_int
            lib.extract_notes.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
            ]
            lib.augment_roll.restype = None
            lib.augment_roll.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.rasterize_notes.restype = None
            lib.rasterize_notes.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def is_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def extract_notes_native(
    piano_roll: np.ndarray,
    onset_roll: Optional[np.ndarray],
    fs: float,
    min_pitch: int,
) -> Optional[List[Tuple[int, int, float, float]]]:
    """(pitch, velocity, start, end) tuples, or None if native unavailable.

    ``onset_roll`` must already be thresholded (values < 64 zeroed) by the
    caller, matching roll_to_midi's preprocessing.
    """
    lib = _load()
    if lib is None:
        return None
    pr = np.ascontiguousarray(piano_roll, dtype=np.float32)
    n_pitch, n_frames = pr.shape
    orow = None
    if onset_roll is not None:
        orow = np.ascontiguousarray(onset_roll, dtype=np.float32)
    cap = max(n_pitch * n_frames // 4, 1024)
    pitches = np.empty(cap, dtype=np.int32)
    velocities = np.empty(cap, dtype=np.int32)
    starts = np.empty(cap, dtype=np.float64)
    ends = np.empty(cap, dtype=np.float64)
    n = lib.extract_notes(
        _fptr(pr),
        _fptr(orow) if orow is not None else None,
        n_pitch, n_frames, ctypes.c_float(fs), min_pitch,
        pitches.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        velocities.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap,
    )
    if n < 0:
        return None  # capacity exceeded; caller falls back
    return [
        (int(pitches[i]), int(velocities[i]), float(starts[i]), float(ends[i]))
        for i in range(n)
    ]


def rasterize_notes_native(
    pitches: np.ndarray,
    velocities: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    fs: float,
    n_frames: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(velocity roll, onset roll) or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(pitches)
    piano = np.zeros((128, n_frames), dtype=np.float32)
    onset = np.zeros((128, n_frames), dtype=np.float32)
    lib.rasterize_notes(
        np.ascontiguousarray(pitches, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(velocities, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(starts, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(ends, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        n, ctypes.c_float(fs), n_frames,
        _fptr(piano), _fptr(onset),
    )
    return piano, onset


def augment_roll_native(
    src: np.ndarray,
    image_size: int,
    pr_len: int,
    start: int,
    k_shift: int,
    do_stretch: bool,
    min_pitch: int,
    max_pitch: int,
):
    """Full per-item training augmentation in one native pass, or None if
    the codec is unavailable. ``src``: (3, 128, T) uint8. Returns
    (3, 128, image_size) float32 — exact semantics of the numpy path in
    data/datasets.py (cross-tested)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    out = np.empty((3, 128, image_size), dtype=np.float32)
    lib.augment_roll(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(src.shape[-1]), int(image_size), int(pr_len), int(start),
        int(k_shift), int(bool(do_stretch)), int(min_pitch), int(max_pitch),
        _fptr(out),
    )
    return out
