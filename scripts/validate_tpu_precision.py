"""TPU-precision validation (SURVEY hard part 5): run the reference's
accuracy oracles on the TPU backend (f32 compute) and compare against the
committed CPU/f64 anchors in results/BASELINE_RESULTS.json.

Oracles:
  * `-test` smoke config (elasticity.c:36): rel-L2 < 0.05 on 3^3 box deg 3
  * config 1 (linElas MMS box 4^3 deg 2): rel-L2 + strain energy
  * config 3 (hyperSS cylinder8_672e deg 3, 10 increments): strain energy +
    iteration counts

f32 CG stalls near rtol 1e-6-1e-7 (residual-recurrence rounding); the
Newton loop recomputes TRUE residuals each iteration, so Newton(rtol 1e-7)
x CG(rtol 1e-6) acts as iterative refinement and recovers oracle-grade
accuracy. Writes results/TPU_PRECISION.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

ROOT = Path(__file__).parent.parent
OUT = ROOT / "results" / "TPU_PRECISION.json"


def run():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    assert jax.default_backend() != "cpu", "run on the TPU backend"
    out = {"backend": jax.default_backend(), "dtype": "float32"}

    # --- smoke test (-test contract) ---------------------------------
    cfg = Config(problem="linElas", degree=3, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(3, 3, 3), ksp_rtol=1e-6)
    cfg.newton.rtol = 1e-7
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    out["smoke"] = {
        "mms_rel_l2": prob.mms_error(info.u),
        "pass": prob.mms_error(info.u) < 0.05,
        "ksp_iters": info.ksp_iters,
        "snes_iters": info.snes_iters,
    }

    # --- config 1 ------------------------------------------------------
    cfg = Config(problem="linElas", degree=2, nu=0.3, E=1e6,
                 box_faces=(4, 4, 4), test_mode=True, ksp_rtol=1e-6)
    cfg.newton.rtol = 1e-7
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    out["config1"] = {
        "mms_rel_l2": prob.mms_error(info.u),
        "strain_energy": prob.strain_energy(info.u),
        "ksp_iters": info.ksp_iters,
        "snes_iters": info.snes_iters,
        "rnorm": float(info.rnorm),
    }

    # --- config 3 ------------------------------------------------------
    cfg = Config(problem="hyperSS", degree=3, nu=0.3, E=1e6,
                 mesh_file="/root/reference/meshes/cylinder8_672e_2ss_us.exo",
                 forcing="none", num_increments=10,
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, -0.02, 0.05)},
                 ksp_rtol=1e-6)
    cfg.newton.rtol = 1e-7
    t0 = time.perf_counter()
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    out["config3"] = {
        "strain_energy": prob.strain_energy(info.u),
        "ksp_iters": info.ksp_iters,
        "snes_iters": info.snes_iters,
        "rnorm": float(info.rnorm),
        "converged": bool(info.converged),
        "solve_time_s": round(info.solve_time, 3),
        "total_time_s": round(time.perf_counter() - t0, 3),
    }

    # --- compare to committed f64 anchors ------------------------------
    anchors = ROOT / "results" / "BASELINE_RESULTS.json"
    if anchors.exists():
        ref = json.loads(anchors.read_text())
        cmp = {}
        if "config1" in ref:
            e64 = ref["config1"]["strain_energy"]
            cmp["config1_energy_rel_diff"] = abs(
                out["config1"]["strain_energy"] - e64) / abs(e64)
            cmp["config1_l2_rel_diff"] = abs(
                out["config1"]["mms_rel_l2"] - ref["config1"]["mms_rel_l2"]
            ) / ref["config1"]["mms_rel_l2"]
        if "config3" in ref and ref["config3"].get("converged"):
            e64 = ref["config3"]["strain_energy"]
            cmp["config3_energy_rel_diff"] = abs(
                out["config3"]["strain_energy"] - e64) / abs(e64)
        out["vs_f64"] = cmp
    OUT.parent.mkdir(exist_ok=True)
    OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    run()
