"""Measure TPU f32 residual-evaluation noise vs the CPU f64 oracle
(VERDICT r3 #8 groundwork).

CONFIG4_ORACLE shows cpu32-deg2 converging in 20 SNES where tpu32-deg2
burns 219 — same dtype, same policy, so the difference is the NOISE
AMPLITUDE of the TPU residual evaluation (noise oscillations > 2% read as
'progress' and reset the stall counter, solve/newton.py:133-135).

This script evaluates the hyperFS residual at the SAME deterministic
state on every available path and reports ||G_path - G_ref||/||G_ref||
against a CPU f64 reference computed in-process via x64 on the CPU
backend of the same script run (run it twice: once under the TPU backend,
once with JAX_PLATFORMS forced to cpu — the states match bitwise because
the state is built in f64 numpy and truncated identically).

Usage: python scripts/residual_noise.py tpu|cpu [out_tag]
Writes/merges results/RESIDUAL_NOISE.json.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

OUT = Path(__file__).parent.parent / "results" / "RESIDUAL_NOISE.json"
MESH = "/root/reference/meshes/cyl-hole_3140e_2ss_us.exo"


def build(degree, use_pallas, x64):
    import jax

    jax.config.update("jax_enable_x64", x64)
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    cfg = Config(problem="hyperFS", degree=degree, nu=0.3, E=1e6,
                 mesh_file=MESH, forcing="none", num_increments=10,
                 bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, 0.0, 0.2)},
                 bc_clamp_rotate={998: (0.0, 0.0, 1.0, 0.2)},
                 use_pallas=use_pallas)
    return ElasticityProblem(cfg)


def state(prob, load=0.5):
    """Deterministic smooth mid-solve-like state, f64 host-side: BC values
    at `load` + a smooth interior displacement field."""
    import jax.numpy as jnp

    coords = np.asarray(prob._coords, np.float64)
    x, y, z = coords.T
    u = np.stack([
        0.05 * np.sin(2 * x) * np.cos(y) * z,
        0.05 * np.cos(x + z) * y,
        0.10 * z * (1 - 0.3 * x * x),
    ])
    bc = np.asarray(prob.bcs.values(coords, load).T, np.float64)
    mask = np.asarray(prob.bc_mask)
    u = np.where(mask, bc, u)
    return jnp.asarray(u.astype(np.float64 if prob.dtype == jnp.float64
                                else np.float32)), \
        jnp.asarray(bc.astype(np.float64 if prob.dtype == jnp.float64
                              else np.float32))


def main():
    import jax

    backend = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    recs = {}
    for degree in (2, 4):
        variants = [("auto", None)]
        if jax.default_backend() == "tpu" and degree == 4:
            variants.append(("row", False))
        for tag, up in variants:
            prob = build(degree, up, x64=False)
            u, bc = state(prob)
            F = prob.F * 0.5
            G, _ = prob._nonlinear_residual(u, bc, F)
            G = np.asarray(G, np.float64)
            key = f"{jax.default_backend()}32-deg{degree}-{tag}" \
                  f"{'-pallas' if prob.factory.use_pallas else ''}"
            recs[key] = {"G": G, "norm": float(np.linalg.norm(G))}
            print(f"{key}: |G| = {recs[key]['norm']:.9e}", flush=True)
        if jax.default_backend() == "cpu":
            prob64 = build(degree, None, x64=True)
            u64, bc64 = state(prob64)
            G64, _ = prob64._nonlinear_residual(u64, bc64, prob64.F * 0.5)
            recs[f"cpu64-deg{degree}"] = {
                "G": np.asarray(G64), "norm": float(np.linalg.norm(G64))}
            print(f"cpu64-deg{degree}: |G| = "
                  f"{recs[f'cpu64-deg{degree}']['norm']:.9e}", flush=True)

    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    # store norms now; cross-backend error ratios are computed when both
    # runs have written their G snapshots
    snap_dir = OUT.parent / "residual_noise_snaps"
    snap_dir.mkdir(exist_ok=True)
    for k, v in recs.items():
        np.save(snap_dir / f"{k}.npy", v["G"])
        data[k] = {"norm": v["norm"]}
    # compute errors vs any available f64 reference snapshots
    for k in list(data.keys()):
        m = k.split("-deg")
        if len(m) != 2 or k.startswith("cpu64"):
            continue
        deg = m[1].split("-")[0]
        ref_p = snap_dir / f"cpu64-deg{deg}.npy"
        me_p = snap_dir / f"{k}.npy"
        if ref_p.exists() and me_p.exists():
            ref = np.load(ref_p)
            me = np.load(me_p)
            data[k]["rel_err_vs_f64"] = float(
                np.linalg.norm(me - ref) / np.linalg.norm(ref))
    OUT.write_text(json.dumps(data, indent=1) + "\n")
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "G"}
                      for k, v in data.items()}, indent=1))


if __name__ == "__main__":
    main()
