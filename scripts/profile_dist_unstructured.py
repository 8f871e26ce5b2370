"""Stage attribution for the GENERIC (non-slab) distributed apply at
ndev=1 (VERDICT r5 item 5 — overhead 4.4x vs the round-5 serial apply).

The per-shard pipeline (parallel/driver.py split_rows) is:
    g2l all_to_all -> node_rows gather (per-NODE width-3 takes)
      -> interleaved-Kg GEMM -> physics -> KgT GEMM
      -> segment_sum scatter -> l2g_add
Times each piece honestly (chained scan + scalar sync) on the deg-3
cylinder the dist bench uses, so the next upgrade (per-shard entity-class
tables + the stacked kernel) starts from measurements.
Writes results/DIST_UNSTR_PROFILE.json.
"""
import json, sys, time
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
    from ceedpetscsolid_tpu.parallel.driver import DistributedProblem
    from ceedpetscsolid_tpu.parallel import dist

    cfg = Config(problem="hyperFS", degree=3, nu=0.3, E=1.0,
                 mesh_file="/root/reference/meshes/cylinder8_5580e_2ss_us.exo",
                 forcing="none", multigrid="none", num_increments=1,
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, 0.0, 0.02)})
    prob = ElasticityProblem(cfg)
    dp = DistributedProblem(prob, ndev=1)
    sa = dp.sa
    nelem_max = sa.conn_local.shape[1] if hasattr(sa, 'conn_local') else None
    out = {"ndofs": 3 * prob.fine_space.num_nodes}

    u = dp.to_owned(np.zeros((3, prob.fine_space.num_nodes), prob.dtype))
    conn = jnp.asarray(np.asarray(sa.conn_local)[0] if sa.conn_local.ndim == 3
                       else np.asarray(sa.conn_local))
    n_local = sa.n_local
    P3 = conn.shape[1]
    out["nelem"] = int(conn.shape[0])
    out["P3"] = int(P3)
    out["gather_rows_take"] = int(conn.size)

    # per-node gather: rows (nelem*P3? -> (nelem, P3*3))
    local = jax.random.normal(jax.random.PRNGKey(0), (3, n_local), jnp.float32)
    def g(loc, cn):
        return dist.node_rows(loc, cn)
    dt = chain(g, (local, conn))
    out["node_rows_gather_ms"] = round(dt*1e3, 3)

    rows = jax.block_until_ready(dist.node_rows(local, conn))
    def seg(ve, cn):
        return jax.ops.segment_sum(ve.reshape(-1, 3), cn.reshape(-1),
                                   num_segments=n_local)
    dt = chain(seg, (rows, conn))
    out["segment_sum_scatter_ms"] = round(dt*1e3, 3)

    # GEMM pair at accurate precision (the body's contraction cost)
    Kg, KgT = dp._sgrads[-1]
    from ceedpetscsolid_tpu.utils.precise import accurate_matmuls
    def gemms(r, a, b):
        with accurate_matmuls():
            return (r.reshape(-1, a.shape[0]) @ a) @ b
    dt = chain(gemms, (rows, Kg, KgT), reps=5)
    out["gemm_pair_accurate_ms"] = round(dt*1e3, 3)

    # full dist apply (the bench's number, for reference)
    bc = dp.to_owned(prob.bcs.values(prob._coords, 1.0).T.astype(prob.dtype))
    args = (bc, dp.F_sh, dp.mask_sh, dp.qdata_sh, dp.qdata_p_sh, dp.sa,
            dp._sgrads[-1], dp.sgrads_p[-1] if dp.composite else None,
            dp._slabd, dp._smats2)
    @jax.jit
    def many(u0, a):
        def body(c, _):
            return c + 1e-30 * dp._resid_sm(c, *a), None
        o, _ = jax.lax.scan(body, u0, None, length=10)
        return jnp.vdot(o.ravel(), o.ravel())
    float(many(u, args))
    t0 = time.perf_counter(); float(many(u, args))
    out["full_dist_apply_ms"] = round((time.perf_counter()-t0)/10*1e3, 3)

    print(json.dumps(out, indent=1))
    json.dump(out, open(Path(__file__).parent.parent /
                        "results/DIST_UNSTR_PROFILE.json", "w"), indent=1)

if __name__ == "__main__":
    main()
