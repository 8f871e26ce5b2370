"""A/B the preconditioner-interior matmul precision (VERDICT r3 #5).

The outer CG matvec always runs at full-f32 matmul precision (it bounds
the attainable residual); this measures whether the V-cycle INTERIOR
(smoothers, transfers, level applies, AMG cycle) can run at the fast
bf16-default without degrading CG/Newton iteration counts.

Configs: the bench solve (hyperFS deg4 box16 MMS), BASELINE config 3
(hyperSS cylinder8_672e deg3 clamp), and the config-4 deg-2 variant
(cyl-hole_3140e deg2 twist clamp).

Usage: python scripts/ab_pc_precision.py [fast accurate] [config names]
Writes/merges results/PC_PRECISION_AB.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

OUT = Path(__file__).parent.parent / "results" / "PC_PRECISION_AB.json"


def configs():
    from ceedpetscsolid_tpu.problem import Config

    def box16():
        c = Config(problem="hyperFS", degree=4, nu=0.3, E=1.0,
                   test_mode=True, box_faces=(16, 16, 16),
                   num_increments=2, ksp_rtol=1e-6)
        c.newton.rtol = 1e-6
        return c

    def config3():
        c = Config(problem="hyperSS", degree=3, nu=0.3, E=1e6,
                   mesh_file="/root/reference/meshes/"
                             "cylinder8_672e_2ss_us.exo",
                   forcing="none", num_increments=10,
                   bc_clamp=(998, 999),
                   bc_clamp_translate={998: (0.0, -0.02, 0.05)},
                   ksp_rtol=1e-6)
        c.newton.rtol = 1e-6
        return c

    def config4_deg2():
        c = Config(problem="hyperFS", degree=2, nu=0.3, E=1e6,
                   mesh_file="/root/reference/meshes/"
                             "cyl-hole_3140e_2ss_us.exo",
                   forcing="none", num_increments=10,
                   bc_clamp=(998, 999),
                   bc_clamp_translate={998: (0.0, 0.0, 0.2)},
                   bc_clamp_rotate={998: (0.0, 0.0, 1.0, 0.2)},
                   ksp_rtol=1e-6)
        c.newton.rtol = 1e-6
        return c

    return {"box16": box16, "config3": config3, "config4_deg2": config4_deg2}


def run(cfg_name, mode):
    from ceedpetscsolid_tpu.problem import ElasticityProblem

    cfg = configs()[cfg_name]()
    cfg.pc_precision = mode
    t0 = time.perf_counter()
    prob = ElasticityProblem(cfg)
    setup_s = time.perf_counter() - t0
    cold = prob.solve()
    info = prob.solve()
    rec = {
        "config": cfg_name, "pc_precision": mode,
        "dofs": info.dofs,
        "snes_iters": info.snes_iters, "ksp_iters": info.ksp_iters,
        "rnorm": float(info.rnorm), "converged": bool(info.converged),
        "reason": info.reason,
        "strain_energy": prob.strain_energy(info.u),
        "solve_time_s": round(info.solve_time, 3),
        "cold_time_s": round(cold.solve_time, 3),
        "cold_snes": cold.snes_iters, "cold_ksp": cold.ksp_iters,
        "setup_s": round(setup_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec), flush=True)
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[f"{cfg_name}-{mode}"] = rec
    OUT.write_text(json.dumps(data, indent=1) + "\n")


def main():
    args = sys.argv[1:]
    modes = [a for a in args if a in ("fast", "accurate")] or \
        ["fast", "accurate"]
    names = [a for a in args if a in configs()] or \
        ["box16", "config3", "config4_deg2"]
    for name in names:
        for mode in modes:
            print(f"=== {name} {mode} ===", flush=True)
            run(name, mode)


if __name__ == "__main__":
    main()
