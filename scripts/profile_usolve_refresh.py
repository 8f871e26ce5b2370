"""VERDICT r5 item 9: is the AMG refresh off the critical path of the
flagship unstructured solve?

Measures, on cylinder8_44928e deg 4 (the BASELINE config-5 workload):
  * one full preconditioner setup (_pc_setup with refresh=True): AMG
    value refresh (device emvals -> d2h -> CSR -> native C++ Galerkin ->
    upload) + Chebyshev eig estimation — HOST-synchronous by construction
    (ends in host numpy), so wall timing is honest;
  * the same with refresh=False (pc_lag cadence reuse);
  * one Jacobian apply (scan-amortized, scalar-synced) for scale.

Share = pc_setup_per_newton / (solve_time / snes_iters) using the
round-5 completed-usolve record (results/BENCH_SELF_r5.json).
Appends to results/SOLVE_PROFILE.json under "usolve_refresh_r5".
"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np

def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    cfg = Config(problem="hyperFS", degree=4, nu=0.3, E=1.0,
                 mesh_file="/root/reference/meshes/cylinder8_44928e_2ss_us.exo",
                 forcing="none", num_increments=4,
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, 0.0, 0.02)})
    t0 = time.time()
    prob = ElasticityProblem(cfg)
    print(f"setup {time.time()-t0:.0f}s", flush=True)
    u = jnp.zeros((3, prob.fine_space.num_nodes), prob.dtype)
    bc = prob.bc_values(0.25)
    G, stash = prob._nonlinear_residual(u, bc, prob.F)
    jax.block_until_ready(stash)

    def sync(x):
        for leaf in jax.tree_util.tree_leaves(x):
            if hasattr(leaf, "ravel"):
                np.asarray(jax.device_get(leaf.ravel()[:1]))
        return x

    # cold AMG refresh (includes aggregation) then warm value-only ones
    t0 = time.time(); prob._refresh_amg(stash)
    cold = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time(); prob._refresh_amg(stash)
        times.append(time.time() - t0)
    warm = min(times)
    # Chebyshev eig estimation / level diagonals (the other per-Jacobian
    # setup piece), scalar-synced
    times = []
    for _ in range(3):
        prob._pc_cache = None
        t0 = time.time(); sync(prob._pc_setup(stash, refresh=True))
        times.append(time.time() - t0)
    lagged = min(times)

    # jacobian apply, scan-amortized with scalar sync
    big = prob._big
    @jax.jit
    def many(v0, st, bg):
        def body(c, _):
            return c + 1e-30 * prob._jac_act_j(c, st, bg), None
        o, _ = jax.lax.scan(body, v0, None, length=10)
        return jnp.vdot(o.ravel(), o.ravel())
    v = jnp.ones_like(u) * 1e-3
    float(many(v, stash, big))
    t0 = time.time(); float(many(v, stash, big))
    japply = (time.time() - t0) / 10

    rec = {
        "pc_setup_cold_s": round(cold, 3),
        "pc_setup_refresh_s": round(warm, 3),
        "cheb_eig_setup_s": round(lagged, 3),
        "jacobian_apply_ms": round(japply * 1e3, 2),
    }
    try:
        bs = json.load(open(Path(__file__).parent.parent /
                            "results/BENCH_SELF_r5.json"))["extra"]
        per_newton = bs["usolve_time_s"] / bs["usolve_snes_iters"]
        rec["usolve_s_per_newton"] = round(per_newton, 2)
        rec["refresh_share_of_solve"] = round(warm / per_newton, 4)
    except Exception as e:
        rec["note"] = repr(e)[:100]
    print(json.dumps(rec, indent=1))
    out = Path(__file__).parent.parent / "results/SOLVE_PROFILE.json"
    data = json.load(open(out)) if out.exists() else {}
    data["usolve_refresh_r5"] = rec
    json.dump(data, open(out, "w"), indent=1)

if __name__ == "__main__":
    main()
