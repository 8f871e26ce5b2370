"""Weak/strong-scaling evidence on the virtual device mesh (VERDICT r2
item 6; BASELINE config 5 north star: >=80% dofs/s scaling).

Real multi-chip hardware is unavailable here, so this measures the two
things that ARE meaningful on an 8-virtual-CPU-device mesh:

  * partition quality: halo volume (ghost slots exchanged per apply) as a
    function of device count on the production-reordered cylinder mesh —
    the quantity that determines the ICI traffic of a real multi-chip run
    (SURVEY L0/E2c; reference DMPlexDistribute + PetscSF halo);
  * rank-count invariance: the converged distributed solution at
    ndev in {1,2,4,8} vs the serial solve (SURVEY section 4: correctness
    is invariant to rank count), plus per-step wall time for the trend.

Writes results/WEAK_SCALING.json.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
       python scripts/weak_scaling.py [mesh.exo] [degree]
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


def main():
    from ceedpetscsolid_tpu.parallel.driver import DistributedProblem
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    mesh = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/meshes/cylinder8_672e_2ss_us.exo"
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    cfg = Config(problem="hyperFS", degree=degree, nu=0.3, E=1e6,
                 mesh_file=mesh, forcing="none", num_increments=2,
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, -0.02, 0.05)},
                 multigrid="logarithmic")
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    u_serial = np.asarray(info.u)
    print(f"serial: {info.snes_iters} SNES {info.ksp_iters} KSP "
          f"rnorm {info.rnorm:.3e}", flush=True)

    out = {"mesh": Path(mesh).name, "degree": degree,
           "dofs": info.dofs,
           "serial": {"snes": info.snes_iters, "ksp": info.ksp_iters,
                      "rnorm": float(info.rnorm)},
           "sweep": []}
    devs = jax.devices()
    for ndev in (1, 2, 4, 8):
        dp = DistributedProblem(prob, ndev=ndev, devices=devs[:ndev])
        hs = dp.part.halo_stats()
        # one warm step timing at the converged state (fixed CG work is not
        # guaranteed across ndev; time the fixed-size pc_setup + step pair)
        u0 = dp.to_owned(np.zeros((3, prob.fine_space.num_nodes)))
        amg_data = dp.refresh_amg(u0, 1.0) if dp.use_mg else None
        pc = dp.pc_setup(u0, 1.0)
        r = dp.newton_step(u0, 1.0, amg_data=amg_data, pc=pc)  # compile
        jax.block_until_ready(r[0])
        t0 = time.perf_counter()
        for _ in range(3):
            r = dp.newton_step(u0, 1.0, amg_data=amg_data, pc=pc)
            jax.block_until_ready(r[0])
        step_ms = (time.perf_counter() - t0) / 3 * 1e3

        u_dist, dinfo = dp.solve()
        err = float(np.abs(u_dist - u_serial).max())
        rec = {
            "ndev": ndev,
            "total_ghosts": hs["total_ghosts"],
            "max_ghosts": hs["max_ghosts"],
            "owned_per_shard": hs["owned_per_shard"],
            "newton_step_ms": round(step_ms, 2),
            "newton_iters": dinfo["newton_iters"],
            "ksp_iters": dinfo["ksp_iters"],
            "rnorm": dinfo["rnorm"],
            "converged": dinfo["converged"],
            "max_abs_diff_vs_serial": err,
        }
        out["sweep"].append(rec)
        print(json.dumps(rec), flush=True)

    # --- box / slab-spectral sweep ------------------------------------
    # The slab pipeline's halo is one node plane per interface: total
    # ghost volume grows as (ndev-1) * Ny*Nx independent of the slab
    # thickness — the weak-scaling signature of a 1-D domain decomposition
    # (each added shard adds one interface, not more per-shard traffic).
    cfgb = Config(problem="hyperFS", degree=3, nu=0.3, E=1.0,
                  test_mode=True, box_faces=(4, 4, 8), num_increments=1,
                  multigrid="logarithmic")
    probb = ElasticityProblem(cfgb)
    infob = probb.solve()
    ub_serial = np.asarray(infob.u)
    box = {"box_faces": [4, 4, 8], "degree": 3, "dofs": infob.dofs,
           "sweep": []}
    for ndev in (1, 2, 4, 8):
        dp = DistributedProblem(probb, ndev=ndev, devices=devs[:ndev])
        hs = dp.part.halo_stats()
        u0 = dp.to_owned(np.zeros((3, probb.fine_space.num_nodes)))
        amg_data = dp.refresh_amg(u0, 1.0) if dp.use_mg else None
        pc = dp.pc_setup(u0, 1.0)
        r = dp.newton_step(u0, 1.0, amg_data=amg_data, pc=pc)
        jax.block_until_ready(r[0])
        t0 = time.perf_counter()
        for _ in range(3):
            r = dp.newton_step(u0, 1.0, amg_data=amg_data, pc=pc)
            jax.block_until_ready(r[0])
        step_ms = (time.perf_counter() - t0) / 3 * 1e3
        ub, dinfo = dp.solve()
        rec = {
            "ndev": ndev,
            "slab": dp.slab is not None,
            "total_ghosts": hs["total_ghosts"],
            "max_ghosts": hs["max_ghosts"],
            "newton_step_ms": round(step_ms, 2),
            "converged": dinfo["converged"],
            "max_abs_diff_vs_serial": float(np.abs(ub - ub_serial).max()),
        }
        box["sweep"].append(rec)
        print(json.dumps(rec), flush=True)
    out["box_slab"] = box

    outp = Path(__file__).parent.parent / "results" / "WEAK_SCALING.json"
    outp.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {outp}")


if __name__ == "__main__":
    main()
