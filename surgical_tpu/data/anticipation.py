"""Phase-anticipation ground-truth generation.

Rebuilds the reference generator (generate_phase_anticipation.py:10-34):
one-hot phase timeline -> per-phase normalized countdown in [0, 1] over a
``horizon``-minute window via a backward scan with per-step increment 1/1500
(the reference's constant for 1-fps video: the code comments say 1 step =
1/60 min but the shipped constant is 1/1500 — we reproduce the shipped
behavior bit-for-bit, with the rate exposed as a parameter).

Vectorized with ``np.minimum.accumulate`` on a reversed ramp instead of a
Python loop; an O(T) scan either way but array-at-a-time.
"""

from __future__ import annotations

import numpy as np

DEFAULT_STEP = 1.0 / 1500.0


def anticipation_gt_one_phase(
    phase_present: np.ndarray, horizon: float, step: float = DEFAULT_STEP
) -> np.ndarray:
    """phase_present: [T] bool/0-1. Returns [T] normalized countdown.

    Semantics (reference :10-29, iterating backward): present -> 0; else
    min(horizon, next_value + step), default horizon. Normalized by horizon.
    """
    present = np.asarray(phase_present).astype(bool)
    T = len(present)
    out = np.empty(T, dtype=np.float64)
    # backward scan: values between occurrences grow by `step` per frame,
    # clipped at horizon. Vectorize by segmenting on the next occurrence.
    nxt = np.full(T, -1, dtype=np.int64)  # index of next present frame >= t
    last = -1
    for t in range(T - 1, -1, -1):
        if present[t]:
            last = t
        nxt[t] = last
    idx = np.arange(T)
    has_next = nxt >= 0
    dist = np.where(has_next, nxt - idx, 0)
    out = np.where(has_next, np.minimum(horizon, dist * step), horizon)
    out[present] = 0.0
    return out / horizon


def anticipation_gt(one_hot_phases: np.ndarray, horizon: float = 5.0,
                    step: float = DEFAULT_STEP) -> np.ndarray:
    """one_hot_phases: [T, P] -> [T, P] normalized anticipation targets
    (reference generate_anticipation_gt :33-34)."""
    one_hot = np.asarray(one_hot_phases)
    return np.stack(
        [anticipation_gt_one_phase(one_hot[:, p], horizon, step)
         for p in range(one_hot.shape[1])],
        axis=1,
    )


def phases_to_one_hot(phase_ids: np.ndarray, num_phases: int = 7) -> np.ndarray:
    phase_ids = np.asarray(phase_ids, dtype=np.int64)
    return np.eye(num_phases, dtype=np.int64)[phase_ids]
