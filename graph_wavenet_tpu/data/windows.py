"""Sliding-window utilities.

- :func:`sliding_windows` — stride-1 window stacking used by both the traffic
  ETL (`/root/reference/generate_training_data.py:41-48`) and the synthetic
  generator (`dataTools.py:148-150`), vectorized via stride tricks.
- :func:`reverse_sliding_window` — inverts stride-1 windowing by averaging
  the overlapped entries (`/root/reference/Utils/util.py:486-508`), used for
  test-time sequence reconstruction; implemented as a vectorized
  sum/count accumulation instead of the reference's per-timestep masked mean.
"""

from __future__ import annotations

import numpy as np


def sliding_windows(data: np.ndarray, width: int,
                    axis: int = 0) -> np.ndarray:
    """All stride-1 windows of ``width`` along ``axis``; the window axis is
    inserted right after ``axis``."""
    # normalize negative axes: for axis=-1, moveaxis(-1, axis+1) would be
    # moveaxis(-1, 0) and misplace the window dim at the front
    axis = axis % data.ndim
    out = np.lib.stride_tricks.sliding_window_view(data, width, axis=axis)
    # window dim arrives last; move it after `axis`
    return np.moveaxis(out, -1, axis + 1)


def reverse_sliding_window(windows_list: list[np.ndarray]) -> list[np.ndarray]:
    """Each input: (num_window, num_nodes, width) stride-1 windows.
    Returns (num_nodes, num_window + width - 1) with overlaps averaged."""
    out = []
    for a in windows_list:
        assert a.ndim == 3
        num_window, num_nodes, width = a.shape
        num_t = num_window + width - 1
        total = np.zeros((num_nodes, num_t))
        count = np.zeros(num_t)
        for w in range(num_window):
            total[:, w:w + width] += a[w]
            count[w:w + width] += 1
        out.append(total / count[None, :])
    return out
