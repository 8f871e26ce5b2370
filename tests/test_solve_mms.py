"""End-to-end MMS verification (SURVEY build stage 4; reference test
strategy items (a)-(b): the `-test` smoke config and convergence rates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceedpetscsolid_tpu.problem import Config, ElasticityProblem


def test_reference_smoke_config():
    """elasticity.c:36: -test -degree 3 -nu 0.3 -E 1 -dm_plex_box_faces 3,3,3
    passes iff relative L2 error < 0.05."""
    cfg = Config(problem="linElas", degree=3, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(3, 3, 3))
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    assert info.converged
    err = prob.mms_error(info.u)
    assert err < 0.05
    assert err < 5e-3  # tighter: expect ~6e-4 at degree 3


def test_mms_convergence_with_degree():
    """L2 error decreases with p on a fixed box (README.rst:122-126).

    3x3x3 box: on smaller boxes the whole-vector norm (reference
    elasticity.c:800-804, boundary included) is dominated by the exact
    boundary values and hides the interior convergence."""
    errs = []
    for degree in (1, 2, 3):
        cfg = Config(problem="linElas", degree=degree, nu=0.3, E=1.0,
                     test_mode=True, box_faces=(3, 3, 3))
        prob = ElasticityProblem(cfg)
        info = prob.solve()
        errs.append(prob.mms_error(info.u))
    assert errs[1] < errs[0] * 0.5
    assert errs[2] < errs[1] * 0.5


def test_jacobian_matches_jvp_hyperfs():
    """Analytic Newton linearization vs jax.jvp of the residual (the free
    cross-check promised in SURVEY stage 5)."""
    cfg = Config(problem="hyperFS", degree=2, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(2, 2, 2), num_increments=1)
    prob = ElasticityProblem(cfg)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=(3, prob.fine_space.num_nodes)) * 0.02)
    bc = prob.bc_values(1.0)
    G, stash = prob._nonlinear_residual(u, bc, prob.F)
    v = jnp.asarray(rng.normal(size=u.shape))
    Jv = prob._jacobian_action(v, stash)
    f = lambda x: prob._nonlinear_residual(x, bc, prob.F)[0]  # noqa: E731
    _, jvp = jax.jvp(f, (u,), (jnp.where(prob.bc_mask, 0.0, v),))
    assert float(jnp.linalg.norm(Jv - jvp) / jnp.linalg.norm(jvp)) < 1e-6


def test_nonlinear_solve_converges():
    cfg = Config(problem="hyperSS", degree=2, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(2, 2, 2), num_increments=2)
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    assert info.converged
    assert info.rnorm < 1e-12


def test_strain_energy_positive():
    cfg = Config(problem="linElas", degree=2, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(2, 2, 2))
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    en = prob.strain_energy(info.u)
    assert np.isfinite(en) and en != 0.0


def test_diagnostics_shape_and_displacement():
    cfg = Config(problem="linElas", degree=2, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(2, 2, 2))
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    d = prob.diagnostics(info.u)
    assert d.shape == (prob.fine_space.num_nodes, 8)
    # first three diagnostic components are the displacement itself
    assert np.allclose(np.asarray(d[:, :3]), np.asarray(info.u).T, atol=1e-12)
