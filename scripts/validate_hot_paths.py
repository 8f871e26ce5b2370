"""Hardware validation of the hot apply paths vs the plain XLA row path.

On the real TPU chip, for every model, compares:
  * the spectral global-GEMM path (ops/spectral.py — the production path
    on box meshes), and
  * the fused Pallas element kernel (ops/pallas_apply.py — the production
    path on structured unstructured-mesh rows)
against the generic XLA structured row pipeline. Prints max rel errors.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _relerr(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-30))


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
        prob = ElasticityProblem(cfg)       # spectral auto-on (box mesh)
        assert prob.factory.use_spectral
        model, phys, spaces = prob.model, prob.phys, prob.spaces
        dtype = prob.dtype

        xfac = OperatorFactory(spaces, dtype=dtype, use_pallas=False,
                               use_spectral=False)
        plfac = OperatorFactory(spaces, dtype=dtype, use_pallas=True,
                                use_spectral=False)
        assert plfac.use_pallas

        N = prob.fine_space.num_nodes
        # small amplitude: finite-strain dets must stay well inside the
        # log1p_series_shifted validity range for a meaningful comparison
        u = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, dtype)
        v = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, dtype)

        qd = prob.qdata
        tol = 2e-4 if dtype == jnp.float32 else 1e-12

        def run(fac, tag):
            # full-f32 matmul precision, as the production solver traces
            # these paths (utils/precise.accurate_matmuls) — ALSO verifies
            # the Pallas kernel honors the dot precision attribute (a
            # default-precision kernel would disagree with the XLA-highest
            # reference at ~bf16 eps, far above tol)
            from ceedpetscsolid_tpu.utils.precise import accurate_matmuls
            with accurate_matmuls():
                res = fac.make_residual_structured(model.residual_planes, phys)
                jac = fac.make_jacobian_structured(model.jacobian_planes, phys)
                qds = fac.struct_qdata(qd)
                r, s = res(u, qds, fac.fine.srestr, fac.fine.sgrad)
                jv = jac(v, qds, s, fac.fine.srestr, fac.fine.sgrad)
            assert bool(jnp.all(jnp.isfinite(r))), f"{problem}/{tag}: NaN"
            sv = fac.stash_view(s)
            return r, jv, sv

        r_x, j_x, s_x = run(xfac, "xla")
        for fac, tag in [(prob.factory, "spectral"), (plfac, "pallas")]:
            r, jv, sv = run(fac, tag)
            err_r, err_j = _relerr(r, r_x), _relerr(jv, j_x)
            err_s = 0.0
            if sv is not None and s_x is not None:
                err_s = max(float(jnp.max(jnp.abs(a - b)))
                            for a, b in zip(sv.m, s_x.m))
            print(f"{problem:14s} {tag:9s} rel_r={err_r:.3e} "
                  f"rel_j={err_j:.3e} stash_abs={err_s:.3e}")
            assert err_r < tol, (problem, tag, err_r)
            assert err_j < tol, (problem, tag, err_j)

    print("hot paths validated on", jax.devices()[0])


if __name__ == "__main__":
    main()
