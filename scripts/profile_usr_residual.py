"""Honest stage attribution of the unstructured residual apply (flagship
cylinder, hyperFS deg 4): gather / pad / fused-kernel / scatter / BC+forcing
wrapper, each chained-scan timed with scalar sync."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np

def chain(fn, args, reps=10):
    @jax.jit
    def run(a):
        def body(c, _):
            aa = jax.lax.optimization_barrier(tuple(a) + (c,))
            r = fn(*aa[:-1])
            s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(r)
                    if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating))
            return aa[-1] + 1e-30*s.astype(jnp.float32), None
        o, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return o
    float(run(args))
    best = 1e9
    for _ in range(2):
        t0=time.perf_counter(); float(run(args)); best=min(best, time.perf_counter()-t0)
    return best/reps

def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
    from ceedpetscsolid_tpu.ops import pallas_apply

    use_pallas = "--row" not in sys.argv
    cfg = Config(problem="hyperFS", degree=4, nu=0.3, E=1.0,
                 mesh_file="/root/reference/meshes/cylinder8_44928e_2ss_us.exo",
                 forcing="none", multigrid="none", num_increments=1,
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, 0.0, 0.02)},
                 use_pallas=use_pallas)
    t0 = time.time()
    prob = ElasticityProblem(cfg)
    print(f"setup {time.time()-t0:.0f}s  use_pallas={prob.factory.use_pallas}")
    sr = prob.factory.fine.srestr
    sk = prob.fine_sgrad if hasattr(prob, 'fine_sgrad') else prob.factory.fine.sgrad
    nelem = prob.factory.nelem
    P3 = prob.factory.fine.basis.P3
    u = jnp.zeros((3, prob.fine_space.num_nodes), prob.dtype)
    bc = prob.bc_values(1.0)
    big = prob._big

    # full wrapper
    dt = chain(lambda uu, b, f, bg: prob._nl_res_j(uu, b, f, bg)[0],
               (u, bc, prob.F, big))
    print(f"full _nl_res_j:        {dt*1e3:7.2f} ms")

    # gather
    dt = chain(lambda uu, r: r.gather_rows(uu.T), (u, sr))
    print(f"gather_rows:           {dt*1e3:7.2f} ms")
    rows0 = jax.block_until_ready(sr.gather_rows(u.T))
    dt = chain(lambda vv, r: r.scatter_rows(vv), (rows0, sr))
    print(f"scatter_rows:          {dt*1e3:7.2f} ms")

    qds = big["qdata_s"]
    if prob.factory.use_pallas:
        fused = pallas_apply.make_fused_apply(
            prob.model.residual_planes, prob.phys, P3, prob.factory.Q3,
            nelem, prob.dtype, stash_in=False, stash_out=True,
            block_elems=prob.factory.block_elems)
        dt = chain(lambda r: pallas_apply.pad_rows(r, fused.e_pad, fused.P3r),
                   (rows0,))
        print(f"pad_rows:              {dt*1e3:7.2f} ms")
        rp0 = jax.block_until_ready(
            pallas_apply.pad_rows(rows0, fused.e_pad, fused.P3r))
        dt = chain(lambda e, q: fused(e, q, sk)[0], (rp0, qds), reps=5)
        print(f"fused kernel:          {dt*1e3:7.2f} ms")
        dt = chain(lambda e, q: fused(e, q, sk)[1], (rp0, qds), reps=5)
        print(f"fused kernel (stash):  {dt*1e3:7.2f} ms")
        dt = chain(lambda e: e[:nelem, :P3*3], (jax.block_until_ready(fused(rp0, qds, sk)[0]),))
        print(f"slice:                 {dt*1e3:7.2f} ms")
    else:
        from ceedpetscsolid_tpu.models.base import Mat3
        Kg, KgT = sk
        Q3 = prob.factory.Q3
        dt = chain(lambda r, k: r @ k, (rows0, Kg), reps=5)
        print(f"fwd GEMM:              {dt*1e3:7.2f} ms")
        due0 = jax.block_until_ready(rows0 @ Kg)
        def phys_only(due, q):
            du = Mat3([due[:, k*Q3:(k+1)*Q3] for k in range(9)])
            dv, stash = prob.model.residual_planes(du, q, prob.phys)
            return jnp.concatenate(dv.m, axis=1)
        dt = chain(phys_only, (due0, qds), reps=5)
        print(f"physics:               {dt*1e3:7.2f} ms")
        dv0 = jax.block_until_ready(phys_only(due0, qds))
        dt = chain(lambda d, k: d @ k, (dv0, KgT), reps=5)
        print(f"bwd GEMM:              {dt*1e3:7.2f} ms")

if __name__ == "__main__":
    main()
