"""Microbench: lattice fold/unfold variants on the current backend.

Times the element gather/scatter building blocks of ops/lattice.py in
isolation (jitted scan with data dependency), comparing the concat-based
fold against the strided at[].add fold and the rows vs component-blocked
interfaces, to pick the fastest formulation for the TPU.

Usage: python scripts/bench_lattice.py [faces] [degree]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from ceedpetscsolid_tpu.ops.lattice import LatticeRestriction


def timed(fn, x0, reps=30, trials=4):
    """fn must be shape-preserving: its output IS the next carry, so XLA
    cannot reduce the chain to a scalar recurrence (scalar-sum feedback is
    algebraically simplified away for linear gather/scatter pipelines)."""
    @jax.jit
    def many(x):
        def body(c, _):
            return fn(c), None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    out = many(x0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(many(x0))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def fold_concat(lr, ve):
    """Round-1 concat-based fold (for comparison)."""
    p, P = lr.p, lr.P
    ex, ey, ez = lr.dims
    C = ve.shape[-1]
    a = ve.reshape(ez, ey, ex, P, P, P, C).transpose(0, 3, 1, 4, 2, 5, 6)
    tail = a[:, p]
    shift = jnp.concatenate([jnp.zeros_like(tail[:1]), tail[:-1]], axis=0)
    slot0 = a[:, :1] + shift[:, None]
    body = jnp.concatenate([slot0, a[:, 1:p]], axis=1)
    a = jnp.concatenate([body.reshape(ez * p, ey, P, ex, P, C), tail[-1:]], axis=0)
    tail = a[:, :, p]
    shift = jnp.concatenate([jnp.zeros_like(tail[:, :1]), tail[:, :-1]], axis=1)
    slot0 = a[:, :, :1] + shift[:, :, None]
    body = jnp.concatenate([slot0, a[:, :, 1:p]], axis=2)
    a = jnp.concatenate([body.reshape(lr.Nz, ey * p, ex, P, C), tail[:, -1:]], axis=1)
    tail = a[:, :, :, p]
    shift = jnp.concatenate([jnp.zeros_like(tail[:, :, :1]), tail[:, :, :-1]], axis=2)
    slot0 = a[:, :, :, :1] + shift[:, :, :, None]
    body = jnp.concatenate([slot0, a[:, :, :, 1:p]], axis=3)
    a = jnp.concatenate([body.reshape(lr.Nz, lr.Ny, ex * p, C), tail[:, :, -1:]], axis=2)
    return a.reshape(lr.num_nodes, C)


def main():
    faces = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    lr = LatticeRestriction((faces,) * 3, degree)
    dt = jnp.float32
    print(f"backend={jax.default_backend()} nelem={lr.nelem} "
          f"nodes={lr.num_nodes} P3={lr.P3}")
    import numpy as np
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((3, lr.num_nodes)), dt)
    ve_rows = jnp.asarray(rng.standard_normal((lr.nelem, lr.P3 * 3)), dt)
    # NOTE: single stages get algebraically simplified away (sum o fold ==
    # sum), so time round-trip PAIRS chained through a same-shaped carry —
    # the actual pipeline pattern. The *0.5+eps breaks sum-preservation.
    def pair_rows(x):
        rows = lr.gather_rows(x.T)
        return lr.scatter_rows(rows * 0.5 + 0.125).T

    def pair_concat(x):
        rows = lr.gather_rows(x.T)
        v = (rows * 0.5 + 0.125).reshape(lr.nelem, lr.P3, 3)
        return fold_concat(lr, v).T

    for name, fn in [("rows(at-add)", pair_rows),
                     ("rows(concat)", pair_concat)]:
        t = timed(fn, u)
        print(f"gather+scatter {name:16s}: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
