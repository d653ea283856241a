"""Footstep-plan bank distributional fidelity.

The reference ships a curated bank of 110 curved footstep plans
(/root/reference/utils/footstep_plans.txt) consumed by the stepping task's
CURVED mode (stepping_task.py:52-64). Our bank is generated procedurally
(utils/footstep_plans.py); these tests pin its distribution to the shipped
bank's measured statistics so a generator regression can't silently change
the CURVED-mode training distribution.

Reference statistics (measured once from the shipped file, baked in here as
the behavioral spec — the file itself is not redistributed):
    plans: 110, footholds/plan mean 12.9, range [7, 18]
    stride (foothold-to-foothold distance):
        mean 0.287 m, std 0.061, p5 0.140, p95 0.340
    heading delta per step:
        mean |dh| 0.149 rad, p95 |dh| 0.687, fraction exactly zero 0.59
        (turns are quantized to multiples of pi/16 = 0.19635)
"""

import pytest

pytestmark = pytest.mark.fast  # cold-fast lane: no humanoid-scale compiles

import numpy as np

from learninghumanoidwalking_tpu.utils.footstep_plans import MAX_STEPS, plan_bank

REF_STEPS_MEAN = 12.9
REF_STEPS_RANGE = (7, 18)
REF_STRIDE_MEAN = 0.287
REF_STRIDE_STD = 0.061
REF_STRIDE_P5 = 0.140
REF_STRIDE_P95 = 0.340
REF_ABS_DH_MEAN = 0.149
REF_ABS_DH_P95 = 0.687
REF_FRAC_STRAIGHT = 0.59


def _bank_stats():
    bank, lengths = plan_bank()
    strides, dheads, nsteps = [], [], []
    for p in range(len(lengths)):
        n = int(lengths[p])
        nsteps.append(n)
        xy = np.stack([bank[p, :n, 0], bank[p, :n, 1]], axis=1)
        strides += list(np.linalg.norm(np.diff(xy, axis=0), axis=1))
        dheads += list(np.diff(bank[p, :n, 3]))
    return np.array(strides), np.array(dheads), np.array(nsteps)


def test_bank_shape_and_padding():
    bank, lengths = plan_bank()
    assert bank.shape == (len(lengths), MAX_STEPS, 4)
    assert np.all(lengths >= 2)
    assert np.all(lengths <= MAX_STEPS)
    # z stays 0 for curved plans; padding repeats the last real step
    assert np.all(bank[:, :, 2] == 0.0)
    for p in range(len(lengths)):
        n = int(lengths[p])
        assert np.all(bank[p, n:] == bank[p, n - 1])
    # plans start at the reference's canonical first foothold (0, -0.07, 0)
    assert np.allclose(bank[:, 0, :2], [0.0, -0.07])
    assert np.all(bank[:, 0, 3] == 0.0)


def test_steps_per_plan_matches_reference():
    _, _, nsteps = _bank_stats()
    assert abs(np.mean(nsteps) - REF_STEPS_MEAN) < 2.0
    assert nsteps.min() >= REF_STEPS_RANGE[0] - 1
    assert nsteps.max() <= REF_STEPS_RANGE[1] + 2


def test_stride_distribution_matches_reference():
    strides, _, _ = _bank_stats()
    assert abs(strides.mean() - REF_STRIDE_MEAN) < 0.03
    # spread must include the shipped bank's short correction-step tail
    assert abs(strides.std() - REF_STRIDE_STD) < 0.03
    assert abs(np.percentile(strides, 5) - REF_STRIDE_P5) < 0.05
    assert abs(np.percentile(strides, 95) - REF_STRIDE_P95) < 0.05


def test_heading_delta_distribution_matches_reference():
    _, dheads, _ = _bank_stats()
    abs_dh = np.abs(dheads)
    assert abs(abs_dh.mean() - REF_ABS_DH_MEAN) < 0.05
    assert abs(np.percentile(abs_dh, 95) - REF_ABS_DH_P95) < 0.25
    # most steps keep heading (long straight stretches with discrete turns)
    frac_zero = np.mean(abs_dh < 1e-9)
    assert abs(frac_zero - REF_FRAC_STRAIGHT) < 0.15
    # both turn directions occur
    assert (dheads > 1e-9).any() and (dheads < -1e-9).any()


def test_turns_are_quantized():
    """Non-final heading changes are multiples of pi/32 (the generator uses
    half-quantum increments of the shipped bank's pi/16 grid)."""
    bank, lengths = plan_bank()
    q = np.pi / 32.0
    for p in range(len(lengths)):
        n = int(lengths[p])
        dh = np.diff(bank[p, : n - 1, 3])  # exclude the final correction step
        steps_off_grid = np.abs(np.round(dh / q) * q - dh)
        assert np.all(steps_off_grid < 1e-5)
