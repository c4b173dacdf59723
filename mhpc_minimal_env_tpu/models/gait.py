"""Gait schedules (bounding) — static, trace-free problem-definition data.

Mirrors /root/reference/Common/header/Gait.h:13-78.  Modes:
    1 = back stance (BS), 2 = flight 1 (FL1), 3 = front stance (FS),
    4 = flight 2 (FL2); cyclic sequence (1,2,3,4), durations
    (0.08, 0.1, 0.08, 0.1) s.

These are *host-side* helpers: mode sequences determine static shapes and
branch structure of the compiled solver, so they are plain Python ints, not
traced arrays.
"""
from __future__ import annotations

import numpy as np

BOUND_MODES = (1, 2, 3, 4)
BOUND_TIMINGS = {1: 0.08, 2: 0.1, 3: 0.08, 4: 0.1}


def next_mode(mode: int) -> int:
    """Gait::get_next_mode (Gait.h:46-53)."""
    i = BOUND_MODES.index(mode)
    return BOUND_MODES[(i + 1) % len(BOUND_MODES)]


def mode_sequence(current_mode: int, num_phases: int):
    """Gait::get_mode_seq (Gait.h:55-66)."""
    seq = [current_mode]
    for _ in range(num_phases - 1):
        seq.append(next_mode(seq[-1]))
    return tuple(seq)


def timings(mode_seq) -> tuple:
    """Gait::get_timings (Gait.h:68-77). float32 durations like the reference."""
    return tuple(np.float32(BOUND_TIMINGS[m]) for m in mode_seq)


def num_steps(mode_seq, dt: float) -> tuple:
    """Per-phase step counts N = round(duration/dt) (MHPCLocomotion.cpp:76)."""
    return tuple(int(round(float(t) / dt)) for t in timings(mode_seq))
