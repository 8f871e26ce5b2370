"""Time the production component-major lattice restriction stages in
isolation: gather (3,e,P3), pad to kernel layout, fused kernel, slice,
scatter_add. Usage: python scripts/profile_lattice_cm.py [faces] [degree]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=30, trials=5):
    @jax.jit
    def many(x, rest):
        def body(c, _):
            y = fn(c, *rest)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(y)) * 1e-30
            return c + s, None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    x0, rest = args[0], args[1:]
    jax.block_until_ready(many(x0, rest))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(many(x0, rest))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    faces = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
    from ceedpetscsolid_tpu.ops import pallas_apply

    cfg = Config(problem="hyperFS", degree=degree, nu=0.3, E=1.0,
                 test_mode=True, box_faces=(faces,) * 3,
                 multigrid="none", num_increments=1)
    prob = ElasticityProblem(cfg)
    fac = prob.factory
    sr = fac.fine.srestr
    nelem, P3, Q3 = fac.nelem, fac.fine.basis.P3, fac.Q3
    e_pad = fac.e_pad
    P3p = -(-P3 // 128) * 128
    print(f"backend={jax.default_backend()} nelem={nelem} P3={P3} "
          f"e_pad={e_pad} P3p={P3p} pallas={fac.use_pallas}")

    u0 = jnp.zeros((3, prob.fine_space.num_nodes), prob.dtype)
    t_g = timed(lambda u: sr.gather(u), u0)
    ue0 = jax.block_until_ready(sr.gather(u0))
    t_pad = timed(lambda e: jnp.pad(
        e, ((0, 0), (0, e_pad - nelem), (0, P3p - P3))), ue0)
    uep0 = jax.block_until_ready(
        jnp.pad(ue0, ((0, 0), (0, e_pad - nelem), (0, P3p - P3))))
    t_slice = timed(lambda e: e[:, :nelem, :P3], uep0)
    t_s = timed(lambda e: sr.scatter_add(e), ue0)
    t_gpad = timed(lambda u: jnp.pad(
        sr.gather(u), ((0, 0), (0, e_pad - nelem), (0, P3p - P3))), u0)
    t_sslice = timed(lambda e: sr.scatter_add(e[:, :nelem, :P3]), uep0)

    if fac.use_pallas:
        fused = pallas_apply.make_fused_apply(
            prob.model.residual_planes, prob.phys, P3, Q3, nelem,
            prob.dtype, stash_in=False, stash_out=True,
            block_elems=fac.block_elems)
        qds = prob._big["qdata_s"]
        sk = prob._big["sgrads"][-1]
        rows0 = jax.block_until_ready(
            pallas_apply.pad_rows(sr.gather_rows(u0.T), fused.e_pad,
                                  fused.P3r))
        t_f = timed(lambda e: fused(e, qds, sk)[0], rows0)
        print(f"fused    : {t_f*1e3:8.3f} ms")

    gb = 3 * nelem * P3 * 4 / 1e9
    print(f"gather   : {t_g*1e3:8.3f} ms  ({gb/t_g:6.1f} GB/s out)")
    print(f"pad      : {t_pad*1e3:8.3f} ms")
    print(f"gather+pad: {t_gpad*1e3:8.3f} ms")
    print(f"slice    : {t_slice*1e3:8.3f} ms")
    print(f"scatter  : {t_s*1e3:8.3f} ms  ({gb/t_s:6.1f} GB/s in)")
    print(f"slice+scatter: {t_sslice*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
