"""Bisect the TPU worker crash in the unstructured solve (VERDICT r3 #1).

BENCH_r03 recorded `usolve_error: TPU worker process crashed ... kernel
fault` for the full hyperFS deg-4 solve on cylinder8_44928e (the
reference's measured workload class, elasticity.c:754-765). The residual
bench on the SAME mesh works, so the fault lives somewhere in the solve
stack: Pallas jacobian (stash_in), coarse-level kernels, diagonal/eig
setup, AMG ELL cycle, or memory pressure.

This script executes the solve stack stage by stage in ONE process with
flushed progress prints + device memory stats, so when the worker dies the
log names the faulting stage. Re-run with a stage list to skip ahead.

Usage: python scripts/bisect_usolve.py [stage...]
  stages (default all, in order): setup residual jac_fine jac_l1 jac_l0
          diag emats amg_setup amg_apply linsolve newton1 solve
Env: CPSTPU_BISECT_PALLAS=0|1  force XLA-row / Pallas hot path
     CPSTPU_BISECT_MESH=...    mesh file (default cylinder8_44928e)
     CPSTPU_BISECT_MG=none|logarithmic
     CPSTPU_BISECT_COARSE=amg|chebyshev
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

MESH = os.environ.get(
    "CPSTPU_BISECT_MESH",
    "/root/reference/meshes/cylinder8_44928e_2ss_us.exo")


def mem(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
        used = st.get("bytes_in_use", 0) / 1e9
        peak = st.get("peak_bytes_in_use", 0) / 1e9
        print(f"    [{tag}] hbm used {used:.2f} GB peak {peak:.2f} GB",
              flush=True)
    except Exception as e:
        print(f"    [{tag}] memory_stats unavailable: {e!r}", flush=True)


def main():
    stages = sys.argv[1:] or ["setup", "residual", "jac_fine", "jac_l1",
                              "jac_l0", "diag", "emats", "amg_setup",
                              "amg_apply", "linsolve", "newton1", "solve"]
    up_env = os.environ.get("CPSTPU_BISECT_PALLAS")
    use_pallas = None if up_env is None else bool(int(up_env))
    mg = os.environ.get("CPSTPU_BISECT_MG", "logarithmic")
    coarse = os.environ.get("CPSTPU_BISECT_COARSE", "amg")

    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    print(f"backend={jax.default_backend()} mesh={MESH}\n"
          f"use_pallas={use_pallas} mg={mg} coarse={coarse}", flush=True)

    t0 = time.perf_counter()
    cfg = Config(problem="hyperFS", degree=4, nu=0.3, E=1e6,
                 mesh_file=MESH, forcing="none", num_increments=2,
                 ksp_rtol=1e-6, multigrid=mg, coarse_solve=coarse,
                 # hard bound on the device time of one CG execution (the
                 # tunneled worker kills very long single XLA programs)
                 ksp_max_it=int(os.environ.get("CPSTPU_BISECT_MAXIT", 400)),
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, 0.0, 0.02)},
                 use_pallas=use_pallas)
    cfg.newton.rtol = 1e-6
    cfg.newton.monitor = lambda it, rn: print(
        f"      newton {it:3d}: rnorm {rn:.4e}", flush=True)
    prob = ElasticityProblem(cfg)
    print(f"setup done in {time.perf_counter()-t0:.1f}s  "
          f"nelem={prob.factory.nelem} nnodes={prob.fine_space.num_nodes} "
          f"use_pallas={prob.factory.use_pallas} "
          f"levels={prob.level_degrees}", flush=True)
    mem("setup")

    u = jnp.zeros((3, prob.fine_space.num_nodes), prob.dtype)
    bc = prob.bc_values(1.0)
    F = prob.F
    G = stash = None

    def ensure_state():
        nonlocal G, stash
        if G is None:
            G, stash = prob._nl_res_j(u, bc, F, prob._big)
            jax.block_until_ready(G)

    for st in stages:
        if st in ("jac_fine", "jac_l1", "jac_l0", "diag", "emats",
                  "amg_setup", "amg_apply", "linsolve"):
            ensure_state()
        if st in ("amg_apply", "linsolve") and prob._use_amg and \
                "amg" not in prob._big:
            prob._refresh_amg(stash)
        if st == "setup":
            continue
        print(f"--- stage {st}", flush=True)
        t0 = time.perf_counter()
        if st == "residual":
            G, stash = prob._nl_res_j(u, bc, F, prob._big)
            jax.block_until_ready(G)
        elif st == "jac_fine":
            jv = prob._jac_act_j(G, stash, prob._big)
            jax.block_until_ready(jv)
        elif st in ("jac_l1", "jac_l0"):
            lvl = {"jac_l0": 0, "jac_l1": 1}[st]
            nlev = len(prob.spaces)
            if lvl >= nlev - 1:
                print("    (skip: level not in hierarchy)", flush=True)
                continue
            lm = prob._big.get("level_masks")
            if lm is None:
                print("    (skip: no MG)", flush=True)
                continue
            v = jnp.zeros((3, prob.spaces[lvl].num_nodes), prob.dtype)

            def japply(v, stash, big, lvl=lvl):
                return prob._raw_jacobian(v, big, stash, level=lvl)

            jv = jax.jit(japply)(v, stash, prob._big)
            jax.block_until_ready(jv)
        elif st == "diag":
            pc = prob._pc_setup_j(stash, prob._big)
            jax.block_until_ready(pc)
        elif st == "emats":
            if not prob._use_amg:
                print("    (skip: no AMG)", flush=True)
                continue
            em = np.asarray(prob._elem_mats0(stash, prob._big))
            print(f"    emats {em.shape} finite={np.isfinite(em).all()}",
                  flush=True)
        elif st == "amg_setup":
            if not prob._use_amg:
                continue
            prob._refresh_amg(stash)
            nlev = len(prob._amg.data["levels"])
            print(f"    amg levels={nlev}", flush=True)
        elif st == "amg_apply":
            if not prob._use_amg or "amg" not in prob._big:
                continue
            from ceedpetscsolid_tpu.problem import _flatwrap
            b0 = jnp.ones((3, prob.spaces[0].num_nodes), prob.dtype)

            def amg_once(b, data, s, big):
                if hasattr(prob, "_build_mg_levels"):
                    mg = prob._build_mg_levels(s, big)
                    top = _flatwrap(lambda v: mg[0].apply(v, s))
                    return prob._amg_apply(b, data, top_mv=top)
                return prob._amg_apply(b, data)

            x = jax.jit(amg_once)(b0, prob._big["amg"], stash, prob._big)
            jax.block_until_ready(x)
        elif st == "linsolve":
            du, iters = prob._linear_solve(G, stash, refresh=True)
            jax.block_until_ready(du)
            print(f"    cg iters={int(iters)}", flush=True)
        elif st == "newton1":
            cfg2 = cfg
            old = cfg2.newton.max_it
            cfg2.newton.max_it = 3
            try:
                bc1 = prob.bc_values(0.5)
                F1 = prob.F * 0.5
                from ceedpetscsolid_tpu.solve.newton import newton_solve

                def residual(uu):
                    return prob._nonlinear_residual(uu, bc1, F1)

                def linear_solve(uu, GG, ss):
                    return prob._linear_solve(GG, ss, refresh=True)

                res = newton_solve(residual, linear_solve, u, cfg2.newton)
                print(f"    newton iters={res.iters} rnorm={res.rnorm:.3e}",
                      flush=True)
            finally:
                cfg2.newton.max_it = old
        elif st == "solve":
            info = prob.solve()
            print(f"    solve: snes={info.snes_iters} ksp={info.ksp_iters} "
                  f"rnorm={info.rnorm:.3e} conv={info.converged} "
                  f"t={info.solve_time:.1f}s "
                  f"mdofs={info.mdofs_per_sec:.3f}", flush=True)
        else:
            print(f"    unknown stage {st!r}", flush=True)
            continue
        print(f"    ok in {time.perf_counter()-t0:.1f}s", flush=True)
        mem(st)
    print("ALL STAGES DONE", flush=True)


if __name__ == "__main__":
    main()
