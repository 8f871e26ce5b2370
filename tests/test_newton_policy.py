"""NewtonPolicy oracles: the shared serial/distributed convergence logic
(solve/newton.py). Locks the round-3 semantics: noise-floor stagnation
exits require real progress; hard stalls report converged=False so the
load loop can sub-step; non-finite residuals diverge."""

import numpy as np

from ceedpetscsolid_tpu.solve.newton import NewtonOptions, NewtonPolicy


def test_rtol_convergence():
    p = NewtonPolicy(NewtonOptions(rtol=1e-8), rnorm0=1.0)
    assert p.check(1e-2) is None
    assert p.check(1e-9) == (True, "rtol")


def test_divergence_on_nan_and_blowup():
    p = NewtonPolicy(NewtonOptions(), rnorm0=1.0)
    assert p.check(float("nan")) == (False, "diverged")
    p = NewtonPolicy(NewtonOptions(divtol=1e4), rnorm0=1.0)
    assert p.check(1e5) == (False, "diverged")


def test_noise_floor_exit_requires_progress():
    # flat residuals NEAR the entry norm must NOT be declared converged
    p = NewtonPolicy(NewtonOptions(rtol=1e-10, stall_rtol=1e-3), rnorm0=1.0)
    out = None
    for _ in range(10):
        out = p.check(0.5)
        if out is not None:
            break
    assert out == (False, "stalled")


def test_noise_floor_exit_after_progress():
    # flat residuals far below entry ARE the fp floor -> clean convergence
    p = NewtonPolicy(NewtonOptions(rtol=1e-10, stall_rtol=1e-3), rnorm0=1.0)
    assert p.check(1e-6) is None        # big drop, no stall yet
    assert p.check(0.995e-6) is None    # < 1% decrease: stall 1
    out = p.check(0.992e-6)             # stall 2 at the floor
    assert out == (True, "stagnation (fp noise floor)")


def test_stol_step_exit_requires_progress():
    # a vanishing step with real progress is stol convergence ...
    p = NewtonPolicy(NewtonOptions(rtol=1e-12, stol=1e-8, stall_rtol=1e-5),
                     rnorm0=1.0)
    assert p.check(1e-7, step=1e-12, unorm=1.0) == (True, "stol")
    # ... but a zero step from a bailed linear solve at rnorm ~ rnorm0
    # is a stall (the load loop sub-steps)
    p = NewtonPolicy(NewtonOptions(rtol=1e-12, stol=1e-8, stall_rtol=1e-5),
                     rnorm0=1.0)
    assert p.check(0.9, step=1e-12, unorm=1.0) == (False, "stalled (no step)")


def test_finalize_max_it_at_floor():
    p = NewtonPolicy(NewtonOptions(rtol=1e-10, stall_rtol=1e-5), rnorm0=1.0)
    assert p.finalize(5e-6) == (True, "max_it (below stall floor)")
    assert p.finalize(1e-2) == (False, "max_it")
    assert p.finalize(float("nan")) == (False, "max_it")


def test_absolute_floor_accepts_substepped_increment():
    # A sub-stepped load increment enters with rnorm0 far below the problem
    # scale; the f32 hardware floor (absolute, carried in floor_atol from
    # previously accepted increments) must still be acceptable — but only
    # with a tiny Newton step (true floor signature), and only within
    # 2x floor_atol.
    opts = NewtonOptions(rtol=1e-10, stall_rtol=1e-5)
    # entry rnorm0=260, floor_atol=0.26: band = max(2.6e-3, 0.52)
    p = NewtonPolicy(opts, rnorm0=260.0, floor_atol=0.26)
    assert p.check(0.31, step=1e-7, unorm=1.0) is None       # improvement
    assert p.check(0.36, step=1e-7, unorm=1.0) is None       # stall 1
    out = p.check(0.33, step=1e-7, unorm=1.0)                # stall 2, tiny
    assert out == (True, "stagnation (fp noise floor)")
    # same residuals with a LARGE step = mid-grind, not the floor
    p = NewtonPolicy(opts, rnorm0=260.0, floor_atol=0.26)
    for _ in range(10):
        out = p.check(0.31, step=0.5, unorm=1.0)
        if out is not None:
            break
    assert out == (False, "stalled")
    # floor_atol also unlocks finalize at the absolute floor
    p = NewtonPolicy(opts, rnorm0=260.0, floor_atol=0.26)
    assert p.finalize(0.36) == (True, "max_it (below stall floor)")
    assert p.finalize(0.9) == (False, "max_it")


def test_oscillation_does_not_reset_stall_counter():
    # f32 noise-floor residuals swing +-50%; down-swings that do not beat
    # the best by stall_decrease must not reset the stall counter
    opts = NewtonOptions(rtol=1e-10, stall_rtol=1e-5, stall_decrease=0.02)
    p = NewtonPolicy(opts, rnorm0=260.0, floor_atol=0.26)
    assert p.check(0.30, step=1e-7, unorm=1.0) is None       # best=0.30
    assert p.check(0.45, step=1e-7, unorm=1.0) is None       # stall 1
    out = p.check(0.298, step=1e-7, unorm=1.0)               # < 2% better
    assert out == (True, "stagnation (fp noise floor)")
