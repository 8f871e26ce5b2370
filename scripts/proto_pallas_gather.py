"""Prototype: Pallas row-gather / gather-sum kernels vs XLA take.

Table (nents, W) fully VMEM-resident; indices scalar-prefetched to SMEM;
per-output-block fori_loop of dynamic row copies.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_feedback(body, x0, reps=50, trials=5):
    @jax.jit
    def many(x):
        def step(c, _):
            return body(c), None
        x, _ = jax.lax.scan(step, x, None, length=reps)
        return x
    out = jax.block_until_ready(many(x0))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = jax.block_until_ready(many(x0))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


NTAB, NROWS, W = 13898, 44928, 32
R = 512          # rows per block


def gather_kernel(ids_ref, tab_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = tab_ref[ids_ref[i], :]
        return 0
    jax.lax.fori_loop(0, R, body, 0)


def pallas_gather(tab, ids):
    nblk = NROWS // R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((NTAB, W), lambda i, ids: (0, 0))],
        out_specs=pl.BlockSpec((R, W), lambda i, ids: (i, 0)),
    )
    return pl.pallas_call(
        gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NROWS, W), tab.dtype),
    )(ids, tab)


# variant: jnp.take inside kernel on a VMEM-resident table
def gather_kernel2(ids_vref, tab_ref, out_ref):
    out_ref[:, :] = jnp.take(tab_ref[:, :], ids_vref[:], axis=0, mode="clip")


def pallas_gather2(tab, ids):
    nblk = NROWS // R
    return pl.pallas_call(
        gather_kernel2,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((R,), lambda i: (i,)),
                  pl.BlockSpec((NTAB, W), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NROWS, W), tab.dtype),
    )(ids, tab)


def main():
    key = jax.random.PRNGKey(0)
    tab0 = jax.random.normal(key, (NTAB, W), jnp.float32)
    ids = jnp.asarray(np.random.randint(0, NTAB - 1, NROWS, dtype=np.int32))

    # correctness
    want = jnp.take(tab0, ids, axis=0)
    for name, fn in (("loop", pallas_gather), ("take", pallas_gather2)):
        try:
            got = fn(tab0, ids)
            err = float(jnp.abs(got - want).max())
            print(f"pallas_{name}: max err {err}")
        except Exception as e:
            print(f"pallas_{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        def body(tab, fn=fn):
            out = fn(tab, ids)
            return tab.at[0].set(out[117]).at[1].set(out[999])
        t = timed_feedback(body, tab0)
        print(f"  pallas_{name}: {t*1e3:.3f} ms ({NROWS/t/1e6:.0f} Mrows/s)")

    def body_xla(tab):
        out = jnp.take(tab, ids, axis=0)
        return tab.at[0].set(out[117]).at[1].set(out[999])
    t = timed_feedback(body_xla, tab0)
    print(f"  xla take : {t*1e3:.3f} ms ({NROWS/t/1e6:.0f} Mrows/s)")


if __name__ == "__main__":
    main()
