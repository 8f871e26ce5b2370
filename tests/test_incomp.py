"""hyperFSIncomp composite-operator oracles (SURVEY stage 9, Q4 kernels):
analytic Jacobian of the mu + reduced-pressure split vs jvp, and a
nearly-incompressible clamp solve."""

import jax
import jax.numpy as jnp
import numpy as np

from ceedpetscsolid_tpu.problem import Config, ElasticityProblem


def test_incomp_jacobian_matches_jvp():
    cfg = Config(problem="hyperFSIncomp", degree=2, nu=0.4, E=1.0,
                 test_mode=True, box_faces=(2, 2, 2), num_increments=1,
                 multigrid="none")
    prob = ElasticityProblem(cfg)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(3, prob.fine_space.num_nodes)) * 0.02)
    bc = prob.bc_values(1.0)
    G, stash = prob._nonlinear_residual(u, bc, prob.F)
    # stash carries both full-quadrature and Q=1 pressure gradients; view
    # through the factory so the assertion is layout-agnostic (the spectral
    # path stores global-quadrature planes, the row path (nelem, Q3))
    assert isinstance(stash, tuple) and len(stash) == 2
    pview = prob.pfactory.stash_view(stash[1])
    assert pview.m[0].shape[-1] == 1   # single reduced-integration point
    v = jnp.asarray(rng.normal(size=u.shape))
    Jv = prob._jacobian_action(v, stash)
    f = lambda x: prob._nonlinear_residual(x, bc, prob.F)[0]  # noqa: E731
    _, jvp = jax.jvp(f, (u,), (jnp.where(prob.bc_mask, 0.0, v),))
    assert float(jnp.linalg.norm(Jv - jvp) / jnp.linalg.norm(jvp)) < 1e-7


def test_incomp_clamp_solve_converges():
    cfg = Config(problem="hyperFSIncomp", degree=2, nu=0.49, E=1e6,
                 forcing="none", box_faces=(2, 2, 2),
                 bc_clamp=(6, 5), bc_clamp_translate={5: (0.05, 0.0, 0.0)},
                 num_increments=1, multigrid="logarithmic", nu_smoother=0.3)
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    assert info.converged
    assert np.isfinite(prob.strain_energy(info.u))
