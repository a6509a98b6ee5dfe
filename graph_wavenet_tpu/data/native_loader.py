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
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_THREADS = min(os.cpu_count() or 1, 8)


def _build_dir() -> str:
    """Where to compile the .so: the repo's native/ dir when writable (dev
    checkout), else a user cache dir — pip installs often land read-only."""
    if os.access(_NATIVE_DIR, os.W_OK):
        return _NATIVE_DIR
    return os.environ.get(
        "GWNET_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "graph_wavenet_tpu"))


def _load_library():
    """Load (building once if needed) the native library; None if
    unavailable — e.g. in a pip install, which ships only the
    ``graph_wavenet_tpu`` package and not ``native/windowloader.cpp``
    (numpy fallback, same semantics).

    The .so is named by the SOURCE HASH, so a cached build from an older
    ``windowloader.cpp`` is never loaded against newer bindings — the C
    ABI has changed before (standardize's 5th argument), and a stale
    binary with matching symbols would silently compute the wrong thing."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(_NATIVE_DIR, "windowloader.cpp")
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        so_name = ("libwindowloader-"
                   f"{hashlib.sha1(f.read()).hexdigest()[:10]}.so")
    so_path = os.path.join(_NATIVE_DIR, so_name)
    if not os.path.exists(so_path):
        out_dir = _build_dir()
        so_path = os.path.join(out_dir, so_name)
        if not os.path.exists(so_path):
            # atomic publish: concurrent first-use (pytest-xdist, two jobs
            # on a fresh checkout) must never CDLL a half-written .so
            tmp = so_path + f".tmp.{os.getpid()}"
            try:
                os.makedirs(out_dir, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", tmp],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, so_path)
            except Exception:
                if os.path.exists(tmp):
                    os.remove(tmp)
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
    if len(anchors) and (anchors.min() < 0 or anchors.max() > t - window):
        # the native path would memcpy out of bounds and the numpy fallback
        # would silently wrap negative indices — both silent, both wrong
        raise ValueError(
            f"window anchors out of range: starts must lie in "
            f"[0, {t - window}] for a {window}-row window over {t} rows "
            f"(got [{anchors.min()}, {anchors.max()}])")
    out = np.empty((len(anchors), window, n, f), dtype=np.float32)
    lib = _load_library()
    if lib is not None:
        lib.gather_windows_f32(series, t, n * f, anchors, len(anchors),
                               window, out, _THREADS)
    else:
        idx = anchors[:, None] + np.arange(window)[None, :]
        out[...] = series[idx]
    return out


def standardize_feature0(arr: np.ndarray, mean: float, std: float) -> bool:
    """In-place ``arr[..., 0] = (arr[..., 0] - mean) / std`` via the native
    threaded kernel. Returns False (caller falls back to numpy) when the
    library is absent or the array isn't float32 C-contiguous."""
    lib = _load_library()
    if (lib is None or arr.dtype != np.float32
            or not arr.flags["C_CONTIGUOUS"] or arr.ndim < 1):
        return False
    f = arr.shape[-1]
    rows = arr.size // f
    # the kernel divides, bit-identical to the numpy (x - mean) / std
    lib.standardize_feature0_f32(arr.reshape(rows, f), rows, f,
                                 float(mean), float(std), _THREADS)
    return True


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
        """``horizon`` is the LAST y offset (reference ``seq_length_y``), so
        y windows cover anchor+y_start .. anchor+horizon — length
        ``horizon - y_start + 1``, exactly the reference's
        ``y_offsets = arange(y_start, seq_length_y + 1)``
        (`generate_training_data.py:56-58`; length == horizon for the
        canonical y_start=1). ``anchors``: optional explicit anchor subset
        (chronological split slices); ``y_series``: optional separate series
        for targets (e.g. raw units while x is standardized — the reference
        keeps targets unscaled, `util.py:208-211`)."""
        from graph_wavenet_tpu.data.loader import pad_with_last

        self.series = np.ascontiguousarray(series, dtype=np.float32)
        self.y_series = (self.series if y_series is None else
                         np.ascontiguousarray(y_series, dtype=np.float32))
        self.window = window
        self.horizon = horizon
        self.batch_size = batch_size
        self.y_start = y_start
        self.y_len = horizon - y_start + 1
        self.rng = rng if rng is not None else np.random.default_rng()
        if anchors is None:
            anchors = self.valid_anchors(series.shape[0], window, horizon,
                                         y_start)
        anchors = np.asarray(anchors, dtype=np.int64)
        self.num_real = len(anchors)
        self.anchors = pad_with_last(anchors, batch_size)
        self.size = len(self.anchors)
        self.num_batch = self.size // batch_size

    @staticmethod
    def valid_anchors(t: int, window: int, horizon: int,
                      y_start: int = 1) -> np.ndarray:
        """All valid anchor rows (anchor = last observed step, reference
        convention `generate_training_data.py:42-44`; the furthest y row
        read is anchor + horizon)."""
        del y_start   # y reach is anchor + horizon regardless of y_start
        first = window - 1
        last = t - horizon - 1
        return np.arange(first, last + 1, dtype=np.int64)

    def shuffle(self):
        self.anchors = self.anchors[self.rng.permutation(self.size)]

    def get_iterator(self):
        for i in range(self.num_batch):
            a = self.anchors[i * self.batch_size:(i + 1) * self.batch_size]
            x = gather_windows(self.series, a - (self.window - 1),
                               self.window)
            y = gather_windows(self.y_series, a + self.y_start, self.y_len)
            yield x, y

    def __len__(self):
        return self.num_batch
