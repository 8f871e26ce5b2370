"""Numerical validation of the fused Pallas apply path vs the XLA
structured path, on the TPU, for every model. Prints max rel errors."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
    from ceedpetscsolid_tpu.ops.operator import OperatorFactory

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    for problem, degree in [("linElas", 3), ("hyperSS", 3), ("hyperFS", 4),
                            ("hyperFSIncomp", 3)]:
        cfg = Config(problem=problem, degree=degree, nu=0.3, E=1.0,
                     test_mode=True, box_faces=(5, 5, 5), multigrid="none",
                     num_increments=1)
        prob = ElasticityProblem(cfg)          # pallas auto-on (TPU, f32)
        assert prob.factory.use_pallas
        # reference: same problem forced onto the XLA structured path
        xfac = OperatorFactory(prob.spaces, dtype=prob.dtype,
                               use_pallas=False)
        res_x = xfac.make_residual_structured(
            prob.model.residual_planes, prob.phys)
        jac_x = xfac.make_jacobian_structured(
            prob.model.jacobian_planes, prob.phys)

        N = prob.fine_space.num_nodes
        # small amplitude: finite-strain dets must stay well inside the
        # log1p_series_shifted validity range for a meaningful comparison
        u = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, prob.dtype)
        v = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, prob.dtype)

        big = prob._big
        lvl = prob.factory.fine
        xlvl = xfac.fine

        if prob.composite:
            # compare the mu-part only: the pressure operator is XLA in
            # both configurations (Q=1 reduced integration)
            res_mu_pl = prob.factory.make_residual_structured(
                prob.model.residual_planes, prob.phys)
            r_pl, stash_pl = res_mu_pl(u, big["qdata_s"], lvl.srestr,
                                       lvl.sgrad)
        else:
            r_pl, stash_pl = prob._raw_residual(u, big)
        r_xla, stash_xla = res_x(u, prob.qdata, xlvl.srestr, xlvl.sgrad)
        assert bool(jnp.all(jnp.isfinite(r_xla))), f"{problem}: XLA ref NaN"
        assert bool(jnp.all(jnp.isfinite(r_pl))), f"{problem}: pallas NaN"
        err_r = float(jnp.linalg.norm(r_pl - r_xla) /
                      (jnp.linalg.norm(r_xla) + 1e-30))

        if prob.composite:
            jmu_pl = prob.factory.make_jacobian_structured(
                prob.model.jacobian_planes, prob.phys)(
                    v, big["qdata_s"], stash_pl, lvl.srestr, lvl.sgrad)
            jmu_x = jac_x(v, prob.qdata, prob.factory.stash_view(stash_pl),
                          xlvl.srestr, xlvl.sgrad)
            err_j = float(jnp.linalg.norm(jmu_pl - jmu_x) /
                          (jnp.linalg.norm(jmu_x) + 1e-30))
        else:
            j_pl = prob._raw_jacobian(v, big, stash_pl)
            j_xla = jac_x(v, prob.qdata, prob.factory.stash_view(stash_pl),
                          xlvl.srestr, xlvl.sgrad)
            err_j = float(jnp.linalg.norm(j_pl - j_xla) /
                          (jnp.linalg.norm(j_xla) + 1e-30))

        # stash parity (hyper models)
        if stash_pl is not None and not prob.composite and stash_xla is not None:
            sv = prob.factory.stash_view(stash_pl)
            serr = max(
                float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(sv.m, stash_xla.m)
            )
        else:
            serr = 0.0
        print(f"{problem:14s} deg{degree}: rel_err residual={err_r:.3e} "
              f"jacobian={err_j:.3e} stash_max={serr:.3e}")
        assert err_r < 1e-5 and err_j < 1e-5, "PALLAS MISMATCH"
    print("ALL OK")


if __name__ == "__main__":
    main()
