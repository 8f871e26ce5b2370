"""Stage-by-stage timing of the production residual pipeline (current API).

Isolates: gather_rows / fused(GEMM+physics+GEMM^T) / scatter_rows, plus the
full residual and jacobian, each timed inside one jitted scan with a data
dependency (measures steady-state op throughput, not dispatch latency).

Usage: python scripts/profile_stages2.py [faces] [degree] [problem] [pallas01]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x0, reps=30, trials=5):
    @jax.jit
    def many(x):
        def body(c, _):
            y = fn(c)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(y)) * 1e-30
            return jax.tree.map(lambda a: a + s, c), None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    out = many(x0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = many(x0)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    faces = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    problem = sys.argv[3] if len(sys.argv) > 3 else "hyperFS"
    force_pallas = (bool(int(sys.argv[4]))
                    if len(sys.argv) > 4 else None)

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
    from ceedpetscsolid_tpu.ops import operator as op_mod

    if force_pallas is not None:
        _orig_init = op_mod.OperatorFactory.__init__

        def _patched(self, *a, **kw):
            kw["use_pallas"] = force_pallas
            _orig_init(self, *a, **kw)

        op_mod.OperatorFactory.__init__ = _patched

    cfg = Config(problem=problem, degree=degree, nu=0.3, E=1.0,
                 test_mode=True, box_faces=(faces,) * 3,
                 multigrid="none", num_increments=1)
    prob = ElasticityProblem(cfg)
    fes = prob.fine_space
    nelem = prob.factory.nelem
    ndofs = 3 * fes.num_nodes
    print(f"backend={jax.default_backend()} nelem={nelem} ndofs={ndofs} "
          f"P3={prob.factory.fine.basis.P3} Q3={prob.factory.Q3} "
          f"pallas={prob.factory.use_pallas}")

    big = prob._big
    sr = big["srestrs"][-1]
    sk = big["sgrads"][-1]
    bc = prob.bc_values(1.0)
    F = prob.F
    u0 = jnp.zeros((3, fes.num_nodes), prob.dtype)

    # full residual
    t_res = timed(lambda u: prob._nonlinear_residual(u, bc, F)[0], u0)
    # full jacobian action
    _, stash = prob._nonlinear_residual(u0, bc, F)
    stash = jax.block_until_ready(stash)
    t_jac = timed(lambda v: prob._jacobian_action(v, stash), u0)

    # stages
    t_gather = timed(lambda u: sr.gather_rows(u.T), u0)
    rows0 = jax.block_until_ready(sr.gather_rows(u0.T))
    e_pad = prob.factory.e_pad
    t_scatter = timed(lambda ve: sr.scatter_rows(ve), rows0)

    if prob.factory.use_pallas:
        from ceedpetscsolid_tpu.ops import pallas_apply
        P3 = prob.factory.fine.basis.P3
        fused = pallas_apply.make_fused_apply(
            prob.model.residual_planes, prob.phys,
            P3, prob.factory.Q3,
            nelem, prob.dtype, stash_in=False, stash_out=True)
        qds = big["qdata_s"]
        ue0 = jax.block_until_ready(
            pallas_apply.pad_rows(rows0, fused.e_pad, fused.P3r))
        t_pack = timed(
            lambda r: pallas_apply.pad_rows(r, fused.e_pad, fused.P3r), rows0)
        t_fused = timed(lambda ue: fused(ue, qds, sk)[0], ue0)
        print(f"pad      : {t_pack*1e3:8.3f} ms")
        print(f"fused(S+GEMM+phys+GEMM^T+S^T): {t_fused*1e3:8.3f} ms")
    else:
        Q3 = prob.factory.Q3
        Kg, KgT = sk
        t_g1 = timed(lambda ue: ue @ Kg, rows0)
        due0 = jax.block_until_ready(rows0 @ Kg)
        from ceedpetscsolid_tpu.models.base import Mat3
        def phys_fn(due):
            du = Mat3([due[:, k * Q3:(k + 1) * Q3] for k in range(9)])
            dv, _ = prob.model.residual_planes(du, big["qdata_s"], prob.phys)
            return jnp.concatenate(dv.m, axis=1)
        t_phys = timed(phys_fn, due0)
        t_g2 = timed(lambda dv: dv @ KgT, due0)
        print(f"GEMM fwd : {t_g1*1e3:8.3f} ms")
        print(f"physics  : {t_phys*1e3:8.3f} ms")
        print(f"GEMM^T   : {t_g2*1e3:8.3f} ms")

    print(f"gather   : {t_gather*1e3:8.3f} ms")
    print(f"scatter  : {t_scatter*1e3:8.3f} ms")
    print(f"residual : {t_res*1e3:8.3f} ms -> {ndofs/t_res/1e6:.1f} MDoF/s")
    print(f"jacobian : {t_jac*1e3:8.3f} ms -> {ndofs/t_jac/1e6:.1f} MDoF/s")
    gemm_flops = 2 * 2 * nelem * (prob.factory.fine.basis.P3 * 3) * (9 * prob.factory.Q3)
    print(f"GEMM flops/residual: {gemm_flops/1e9:.2f} GF "
          f"-> {gemm_flops/t_res/1e12:.2f} TF/s achieved in residual")


if __name__ == "__main__":
    main()
