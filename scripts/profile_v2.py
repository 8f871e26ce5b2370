"""Stage-by-stage timing of the structured (v2) residual pipeline.

Isolates gather / GEMM / physics / GEMM^T / scatter, each jitted in a scan
with a data dependency, to see where the residual time goes.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def scan_med(fn, x0, reps=50, trials=5):
    @jax.jit
    def many(x):
        def body(c, _):
            y = fn(c)
            # keep output shape == input shape via cheap projection
            return jax.tree.map(lambda a, b: a + 1e-30 * jnp.sum(b), c,
                                y) if False else c_like(y, c), None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    def c_like(y, c):
        s = sum(jnp.sum(l) for l in jax.tree.leaves(y)) * 1e-30
        return jax.tree.map(lambda a: a + s, c)

    out = many(x0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = many(x0)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / reps)
    return sorted(ts)[len(ts) // 2]


def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
    from ceedpetscsolid_tpu.models.base import Mat3

    f = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cfg = Config(problem="hyperFS", degree=4, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(f, f, f), multigrid="none", num_increments=1)
    prob = ElasticityProblem(cfg)
    lvl = prob.factory.fine
    sr, (Kg, KgT) = lvl.srestr, lvl.sgrad
    Q3 = lvl.basis.Q3
    model = prob.model
    phys = prob.phys
    qd = prob.qdata
    N = prob.fine_space.num_nodes
    nelem = sr.nelem
    dt = prob.dtype
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, dt)

    u_rows = u.T
    Ue = sr.gather_rows(u_rows)
    due = Ue @ Kg
    du = Mat3([due[:, k * Q3:(k + 1) * Q3] for k in range(9)])
    dv, _ = model.residual_planes(du, qd, phys)
    dv2 = jnp.concatenate(dv.m, axis=1)
    ve = dv2 @ KgT

    stages = [
        ("gather", lambda x: sr.gather_rows(x), u_rows),
        ("gemm", lambda x: x @ Kg, Ue),
        ("physics", lambda x: jnp.concatenate(
            model.residual_planes(
                Mat3([x[:, k * Q3:(k + 1) * Q3] for k in range(9)]),
                qd, phys)[0].m, axis=1), due),
        ("gemmT", lambda x: x @ KgT, dv2),
        ("scatter", lambda x: sr.scatter_rows(x), ve),
    ]
    total = 0.0
    for name, fn, x in stages:
        t = scan_med(fn, x)
        total += t
        print(f"{name:8s}: {t*1e6:8.1f} us")
    print(f"{'sum':8s}: {total*1e6:8.1f} us")

    def full(x):
        Ue = sr.gather_rows(x)
        due = Ue @ Kg
        du = Mat3([due[:, k * Q3:(k + 1) * Q3] for k in range(9)])
        dv, _ = model.residual_planes(du, qd, phys)
        ve = jnp.concatenate(dv.m, axis=1) @ KgT
        return sr.scatter_rows(ve)

    t = scan_med(full, u_rows)
    ndofs = 3 * N
    print(f"{'full':8s}: {t*1e6:8.1f} us  -> {1e-6*ndofs/t:7.1f} MDoF/s")
    # GEMM roofline: 2 GEMMs, 2*M*K*N flops each
    M, K3, N9 = nelem, Kg.shape[0], Kg.shape[1]
    fl = 2 * 2 * M * K3 * N9
    print(f"GEMM flops/apply: {fl/1e9:.2f} GF -> at full {fl/t/1e12:.2f} TF/s")


if __name__ == "__main__":
    main()
