"""True weak-scaling sweep on the virtual device mesh (VERDICT r3 #7;
BASELINE north star: >=80% dofs/s weak-scaling efficiency).

Round 3's artifact was a fixed-size (strong-type) sweep of a problem far
too small; this one holds WORK PER SHARD fixed and grows the mesh with
the device count:

  * box series: (24, 24, 4*ndev) faces at degree 3 — exactly 2304
    elements/shard for ndev in {1, 2, 4, 8}; the slab partition adds one
    interface PLANE per added shard, so the per-shard halo volume is
    CONSTANT — the weak-scaling signature of a 1-D decomposition.
  * cylinder pair: 672e @ 1 dev vs 5544e @ 8 devs (~matched 672-693
    elements/shard on the BFS-reordered unstructured meshes).

Per point: per-shard halo slots + bytes (the ICI-traffic model — this is
the quantity that transfers to real hardware), and the wall time of a
FIXED-WORK Newton step (ksp_max_it pinned, rtol 0 so every point runs the
identical CG iteration count).  TIMINGS ARE VIRTUAL-CPU, INDICATIVE ONLY:
8 virtual devices share 2 physical cores, so per-step time grows with
TOTAL work; the halo model is the transferable signal.

Also kept (round-3's valuable part): rank-count invariance of the full
solve on a fixed mesh — distributed vs serial solution max |diff|.

Writes results/WEAK_SCALING.json.

Usage: python scripts/weak_scaling.py [--quick]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

BYTES_PER_SLOT_F32 = 4   # one ghost DOF slot at the TPU f32 width


def fixed_step_point(prob, ndev, devs, ksp_its):
    """Compile + time a fixed-work Newton step; return timing + halo rec."""
    from ceedpetscsolid_tpu.parallel.driver import DistributedProblem

    dp = DistributedProblem(prob, ndev=ndev, devices=devs[:ndev])
    hs = dp.part.halo_stats()
    u0 = dp.to_owned(np.zeros((3, prob.fine_space.num_nodes)))
    amg_data = dp.refresh_amg(u0, 1.0) if dp.use_mg else None
    t0 = time.perf_counter()
    pc = dp.pc_setup(u0, 1.0)
    r = dp.newton_step(u0, 1.0, amg_data=amg_data, pc=pc)
    jax.block_until_ready(r[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = dp.newton_step(u0, 1.0, amg_data=amg_data, pc=pc)
        jax.block_until_ready(r[0])
    step_ms = (time.perf_counter() - t0) / reps * 1e3
    ghosts = hs["ghosts_per_shard"]
    per_shard_halo = [int(g) for g in ghosts]
    return dp, {
        "ndev": ndev,
        "dofs": 3 * prob.fine_space.num_nodes,
        "elems_per_shard": prob.factory.nelem / ndev,
        "halo_slots_per_shard": per_shard_halo,
        "halo_max_slots": hs["max_ghosts"],
        "halo_max_bytes_f32": hs["max_ghosts"] * 3 * BYTES_PER_SLOT_F32,
        "owned_per_shard": hs["owned_per_shard"],
        "fixed_ksp_its": ksp_its,
        "newton_step_ms": round(step_ms, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    quick = "--quick" in sys.argv
    devs = jax.devices()
    out = {"note": "virtual-CPU timings are indicative only (8 virtual "
                   "devices share 2 physical cores; per-step time grows "
                   "with TOTAL work); the halo model is the transferable "
                   "signal", "box_weak": [], "cyl_weak": []}

    # --- box weak series: fixed 2304 elements/shard -----------------------
    ndevs = (1, 2) if quick else (1, 2, 4, 8)
    for ndev in ndevs:
        cfg = Config(problem="hyperFS", degree=3, nu=0.3, E=1.0,
                     test_mode=True, box_faces=(24, 24, 4 * ndev),
                     num_increments=1, multigrid="logarithmic",
                     ksp_rtol=0.0, ksp_max_it=10)
        prob = ElasticityProblem(cfg)
        dp, rec = fixed_step_point(prob, ndev, devs, 10)
        rec["box_faces"] = [24, 24, 4 * ndev]
        rec["slab"] = dp.slab is not None
        out["box_weak"].append(rec)
        print(json.dumps(rec), flush=True)

    # halo model check: per-shard halo should be ~constant across the
    # multi-device series (ndev=1 has no interfaces and is excluded)
    h = [r["halo_max_slots"] for r in out["box_weak"] if r["ndev"] > 1]
    out["box_halo_constant"] = bool(
        not h or max(h) <= 1.05 * min(h))

    # --- cylinder weak pair: ~matched elements/shard ----------------------
    cyl = [("cylinder8_672e_2ss_us.exo", 1)]
    if not quick:
        cyl.append(("cylinder8_5580e_2ss_us.exo", 8))
    for mesh, ndev in cyl:
        path = f"/root/reference/meshes/{mesh}"
        cfg = Config(problem="hyperFS", degree=3, nu=0.3, E=1e6,
                     mesh_file=path, forcing="none", num_increments=1,
                     bc_clamp=(998, 999),
                     bc_clamp_translate={998: (0.0, -0.02, 0.05)},
                     multigrid="logarithmic", ksp_rtol=0.0, ksp_max_it=10)
        prob = ElasticityProblem(cfg)
        dp, rec = fixed_step_point(prob, ndev, devs, 10)
        rec["mesh"] = Path(path).name
        out["cyl_weak"].append(rec)
        print(json.dumps(rec), flush=True)

    # --- rank-count invariance on a fixed mesh (kept from round 3) -------
    from ceedpetscsolid_tpu.parallel.driver import DistributedProblem

    cfg = Config(problem="hyperFS", degree=2, nu=0.3, E=1e6,
                 mesh_file="/root/reference/meshes/cylinder8_672e_2ss_us.exo",
                 forcing="none", num_increments=2,
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, -0.02, 0.05)},
                 multigrid="logarithmic")
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    u_serial = np.asarray(info.u)
    inv = {"mesh": "cylinder8_672e_2ss_us.exo", "degree": 2,
           "dofs": info.dofs,
           "serial": {"snes": info.snes_iters, "ksp": info.ksp_iters,
                      "rnorm": float(info.rnorm)},
           "sweep": []}
    for ndev in ((1, 2) if quick else (1, 2, 4, 8)):
        dp = DistributedProblem(prob, ndev=ndev, devices=devs[:ndev])
        u_dist, dinfo = dp.solve()
        rec = {"ndev": ndev,
               "newton_iters": dinfo["newton_iters"],
               "ksp_iters": dinfo["ksp_iters"],
               "rnorm": dinfo["rnorm"],
               "converged": dinfo["converged"],
               "max_abs_diff_vs_serial":
                   float(np.abs(u_dist - u_serial).max())}
        inv["sweep"].append(rec)
        print(json.dumps(rec), flush=True)
    out["invariance"] = inv

    outp = Path(__file__).parent.parent / "results" / "WEAK_SCALING.json"
    outp.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {outp}")


if __name__ == "__main__":
    main()
