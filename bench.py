"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md north star): hyperFS residual-evaluation
throughput per chip at degree 4 — millions of DoFs processed per second,
where one "DoF processed" is one degree of freedom touched by one full
matrix-free residual evaluation (gather -> basis -> physics -> basis^T ->
scatter). The reference defines DoFs/sec = dofs * CG_iters / time
(elasticity.c:763-764); each CG iteration is one operator evaluation, so
this is the same quantity measured at the operator level.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the recorded best of previous rounds (1.0 in round 1).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    backend = jax.default_backend()
    # f64 on CPU for correctness parity; f32 on TPU (MXU path)
    if backend == "cpu":
        jax.config.update("jax_enable_x64", True)
        faces, reps = (8, 8, 8), 10
    else:
        faces, reps = (12, 12, 12), 50

    cfg = Config(
        problem="hyperFS", degree=4, nu=0.3, E=1.0, test_mode=True,
        box_faces=faces, multigrid="none", num_increments=1,
    )
    prob = ElasticityProblem(cfg)
    ndofs = 3 * prob.fine_space.num_nodes

    bc = prob.bc_values(1.0)
    F = prob.F

    resid = lambda u: prob._nonlinear_residual(u, bc, F)[0]  # noqa: E731
    u = jnp.zeros((3, prob.fine_space.num_nodes), prob.dtype)

    # Time `reps` residual evaluations inside ONE jitted scan with a data
    # dependency between iterations: measures operator throughput, not the
    # per-dispatch host->TPU transport latency (~0.5 ms on tunneled chips).
    @jax.jit
    def many(u0):
        def body(c, _):
            r = resid(c)
            return c + 1e-30 * jnp.sum(r), None
        out, _ = jax.lax.scan(body, u0, None, length=reps)
        return out

    r = many(u)          # compile + warmup
    jax.block_until_ready(r)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(many(u))
        best = min(best, time.perf_counter() - t0)

    mdofs_per_sec = 1e-6 * ndofs * reps / best
    print(
        json.dumps(
            {
                "metric": "hyperfs_residual_mdofs_per_sec_per_chip",
                "value": round(mdofs_per_sec, 3),
                "unit": "MDoF/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
