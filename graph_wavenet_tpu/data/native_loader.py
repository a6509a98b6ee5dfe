"""ctypes bindings for the native (C++) batch-assembly library, plus the
memory-lean :class:`WindowDataLoader`.

The reference pipeline materializes every stride-1 window before training
(`/root/reference/generate_training_data.py:41-48` — ~10x data blow-up) and
batches with numpy fancy indexing. Here the raw ``(T, N, F)`` series stays
as-is and shuffled batches are assembled on demand: each window is one
contiguous row-range ``memcpy``, threaded across the batch in
``native/windowloader.cpp``. Falls back to numpy transparently when the
shared library is absent (an attempt is made to build it with g++ once).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_THREADS = min(os.cpu_count() or 1, 8)


def _load_library():
    """Load (building once if needed) the native library; None if
    unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = os.path.join(_NATIVE_DIR, "libwindowloader.so")
    if not os.path.exists(so_path):
        src = os.path.join(_NATIVE_DIR, "windowloader.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", src, "-o", so_path],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.gather_windows_f32.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int64, f32p, ctypes.c_int]
    lib.gather_batch_f32.argtypes = [
        f32p, ctypes.c_int64, i64p, ctypes.c_int64, f32p, ctypes.c_int]
    lib.standardize_feature0_f32.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_int]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load_library() is not None


def gather_windows(series: np.ndarray, anchors: np.ndarray,
                   window: int) -> np.ndarray:
    """series (T, N, F) float32, anchors (B,) window-start rows ->
    (B, window, N, F). Native memcpy path with numpy fallback."""
    series = np.ascontiguousarray(series, dtype=np.float32)
    anchors = np.ascontiguousarray(anchors, dtype=np.int64)
    t, n, f = series.shape
    out = np.empty((len(anchors), window, n, f), dtype=np.float32)
    lib = _load_library()
    if lib is not None:
        lib.gather_windows_f32(series, t, n * f, anchors, len(anchors),
                               window, out, _THREADS)
    else:
        idx = anchors[:, None] + np.arange(window)[None, :]
        out[...] = series[idx]
    return out


def gather_batch(samples: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """samples (S, ...) float32, idx (B,) -> (B, ...) gathered copy."""
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty((len(idx),) + samples.shape[1:], dtype=np.float32)
    lib = _load_library()
    if lib is not None:
        elems = int(np.prod(samples.shape[1:]))
        lib.gather_batch_f32(samples, elems, idx, len(idx), out, _THREADS)
    else:
        out[...] = samples[idx]
    return out


class WindowDataLoader:
    """Memory-lean batcher over a raw feature series.

    Holds the unwindowed ``(T, N, F)`` series and assembles
    ``(x, y)`` = (window ending at anchor, next ``horizon`` steps) batches
    on demand — the exact sample semantics of
    `generate_graph_seq2seq_io_data` + `DataLoader` without the windowed
    copy. Pads the final batch with the last anchor (reference
    pad-with-last behavior, `util.py:25-30`).
    """

    def __init__(self, series: np.ndarray, window: int, horizon: int,
                 batch_size: int, y_start: int = 1,
                 anchors: np.ndarray | None = None,
                 y_series: np.ndarray | None = None,
                 rng: np.random.Generator | None = None):
        """``anchors``: optional explicit anchor subset (chronological split
        slices); ``y_series``: optional separate series for targets (e.g.
        raw units while x is standardized — the reference keeps targets
        unscaled, `util.py:208-211`)."""
        self.series = np.ascontiguousarray(series, dtype=np.float32)
        self.y_series = (self.series if y_series is None else
                         np.ascontiguousarray(y_series, dtype=np.float32))
        self.window = window
        self.horizon = horizon
        self.batch_size = batch_size
        self.y_start = y_start
        self.rng = rng if rng is not None else np.random.default_rng()
        if anchors is None:
            anchors = self.valid_anchors(series.shape[0], window, horizon,
                                         y_start)
        self.anchors = np.asarray(anchors, dtype=np.int64)
        self.num_real = len(self.anchors)
        pad = (-self.num_real) % batch_size
        if pad:
            self.anchors = np.concatenate(
                [self.anchors, np.repeat(self.anchors[-1:], pad)])
        self.size = len(self.anchors)
        self.num_batch = self.size // batch_size

    @staticmethod
    def valid_anchors(t: int, window: int, horizon: int,
                      y_start: int = 1) -> np.ndarray:
        """All valid anchor rows (anchor = last observed step, reference
        convention `generate_training_data.py:42-44`)."""
        first = window - 1
        last = t - (y_start + horizon - 1) - 1
        return np.arange(first, last + 1, dtype=np.int64)

    def shuffle(self):
        self.anchors = self.anchors[self.rng.permutation(self.size)]

    def get_iterator(self):
        for i in range(self.num_batch):
            a = self.anchors[i * self.batch_size:(i + 1) * self.batch_size]
            x = gather_windows(self.series, a - (self.window - 1),
                               self.window)
            y = gather_windows(self.y_series, a + self.y_start,
                               self.horizon)
            yield x, y

    def __len__(self):
        return self.num_batch
