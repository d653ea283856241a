"""Curved footstep plan generation.

The reference ships a static bank of pre-generated curved footstep sequences
(/root/reference/utils/footstep_plans.txt: "---"-separated (x, y, theta)
lines) consumed by the stepping task's CURVED mode. Here the bank is
generated procedurally at build time with a fixed seed: alternating left/right
footholds along a midline whose heading drifts in randomly-chosen arc
segments — the same structure the shipped plans exhibit (straight segments,
gentle arcs, occasional heading corrections).

Plans are padded to a fixed (n_plans, max_steps, 4) array ([x, y, z, theta],
z = 0 for curved plans) + per-plan lengths so CURVED-mode resets are a single
gather inside jit.
"""

from __future__ import annotations

import numpy as np

MAX_STEPS = 24


def generate_plan(rng: np.random.Generator, n_steps: int) -> np.ndarray:
    """One curved plan: (n_steps, 3) of (x, y, theta)."""
    step_len = rng.uniform(0.22, 0.32)
    half_width = rng.uniform(0.06, 0.08)
    pos = np.zeros(2)
    heading = 0.0
    # first foothold directly right of origin (plans start with (0, -0.07, 0))
    steps = [np.array([0.0, -0.07, 0.0])]
    side = 1.0  # next step left
    # heading drift: piecewise-constant turn rate over segments
    turn = 0.0
    for i in range(1, n_steps):
        if rng.uniform() < 0.3:
            turn = rng.choice([-1.0, 0.0, 1.0]) * rng.uniform(0.1, 0.4)
        heading += turn / 2.0
        pos = pos + step_len / 2.0 * np.array([np.cos(heading), np.sin(heading)])
        normal = np.array([-np.sin(heading), np.cos(heading)])
        foot = pos + side * half_width * 2.0 * normal
        steps.append(np.array([foot[0], foot[1], heading]))
        side = -side
    return np.stack(steps)


def plan_bank(n_plans: int = 40, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """(n_plans, MAX_STEPS, 4) padded [x, y, z=0, theta] + (n_plans,) lengths."""
    rng = np.random.default_rng(seed)
    bank = np.zeros((n_plans, MAX_STEPS, 4), dtype=np.float32)
    lengths = np.zeros(n_plans, dtype=np.int32)
    for p in range(n_plans):
        n = int(rng.integers(10, MAX_STEPS + 1))
        plan = generate_plan(rng, n)
        bank[p, :n, 0] = plan[:, 0]
        bank[p, :n, 1] = plan[:, 1]
        bank[p, :n, 3] = plan[:, 2]
        # pad with the last step so out-of-range gathers are benign
        bank[p, n:] = bank[p, n - 1]
        lengths[p] = n
    return bank, lengths
