"""Stage-by-stage timing of the residual pipeline on the current backend.

Times each piece of gather -> B -> physics -> B^T -> scatter in isolation
(jitted separately, with a dependency chain and block_until_ready), plus the
whole fused residual, so we can see where the time goes relative to the
f32 roofline.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
    from ceedpetscsolid_tpu.models import hyper_fs

    backend = jax.default_backend()
    if backend == "cpu":
        jax.config.update("jax_enable_x64", True)
    faces = (12, 12, 12) if backend != "cpu" else (6, 6, 6)
    if len(sys.argv) > 1:
        f = int(sys.argv[1])
        faces = (f, f, f)

    cfg = Config(problem="hyperFS", degree=4, nu=0.3, E=1.0, test_mode=True,
                 box_faces=faces, multigrid="none", num_increments=1)
    prob = ElasticityProblem(cfg)
    fes = prob.fine_space
    fac = prob.factory
    basis = fac.fine.basis
    restr = fac.fine.restr
    qdata = prob.qdata
    phys = prob.phys
    nelem, P3, Q3 = restr.nelem, restr.P3, basis.Q3
    print(f"backend={backend} faces={faces} nelem={nelem} P3={P3} Q3={Q3} "
          f"nodes={fes.num_nodes} dofs={3*fes.num_nodes} dtype={prob.dtype}")

    u = jnp.ones((3, fes.num_nodes), prob.dtype)
    ue = restr.gather(u)
    du = basis.apply_grad(ue)
    dv, stash = hyper_fs.residual_qf(du, qdata, phys)
    ve = basis.apply_grad_T(dv)

    gather = jax.jit(lambda u: restr.gather(u))
    bgrad = jax.jit(lambda ue: basis.apply_grad(ue))
    physf = jax.jit(lambda du: hyper_fs.residual_qf(du, qdata, phys)[0])
    bgradT = jax.jit(lambda dv: basis.apply_grad_T(dv))
    scat = jax.jit(lambda ve: restr.scatter_add(ve))
    full = jax.jit(
        lambda u: restr.scatter_add(
            basis.apply_grad_T(
                hyper_fs.residual_qf(basis.apply_grad(restr.gather(u)),
                                     qdata, phys)[0])))

    t_g = timeit(gather, u)
    t_b = timeit(bgrad, ue)
    t_p = timeit(physf, du)
    t_bt = timeit(bgradT, dv)
    t_s = timeit(scat, ve)
    t_f = timeit(full, u)

    flops_b = 2 * 3 * nelem * P3 * 3 * Q3   # one grad apply as single GEMM
    for name, t, fl in [("gather", t_g, 0), ("B_grad", t_b, flops_b),
                        ("physics", t_p, 0), ("B_gradT", t_bt, flops_b),
                        ("scatter", t_s, 0), ("FULL", t_f, 2 * flops_b)]:
        gf = fl / t / 1e9 if fl else 0.0
        print(f"  {name:8s} {t*1e6:9.1f} us   {gf:8.1f} GFLOP/s")
    print(f"  sum of stages: {(t_g+t_b+t_p+t_bt+t_s)*1e6:.1f} us")
    ndofs = 3 * fes.num_nodes
    print(f"  full-residual throughput: {1e-6*ndofs/t_f:.1f} MDoF/s")


if __name__ == "__main__":
    main()
