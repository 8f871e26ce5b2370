"""Probe which gather forms Mosaic/Pallas-TPU can lower (VERDICT r3 #4
groundwork): if an in-VMEM row gather compiles, the restriction can be
fused into the element kernel (window DMA + local gather); if not, the
XLA-level gather remains the only road and optimization must happen at
the layout level.

Each probe is compiled and run on a small shape; prints OK/FAIL + error
head. Also times an XLA row-gather for reference.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        r = fn()
        jax.block_until_ready(r)
        print(f"OK    {name}: {np.asarray(r).ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = repr(e).replace("\n", " ")[:300]
        print(f"FAIL  {name}: {msg}", flush=True)
        return False


def main():
    W, R, C = 512, 256, 128          # table rows, gather rows, row width
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (W, C), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, W, jnp.int32)
    ref = np.asarray(tab)[np.asarray(idx)]

    # 1. jnp.take along sublanes inside a kernel
    def k_take(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take(tab_ref[...], idx_ref[...], axis=0)

    probe("take_axis0", lambda: pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx))

    # 2. take_along_axis with broadcast index
    def k_taa(tab_ref, idx_ref, out_ref):
        ix = idx_ref[...][:, None]
        out_ref[...] = jnp.take_along_axis(
            tab_ref[...], jnp.broadcast_to(ix, (R, C)), axis=0)

    probe("take_along_axis0", lambda: pl.pallas_call(
        k_taa,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx))

    # 3. scalar-loop dynamic slicing via fori (sublane dynamic index)
    def k_loop(tab_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(idx_ref[i], 1), :]
            return 0
        jax.lax.fori_loop(0, R, body, 0)

    probe("fori_dynslice", lambda: pl.pallas_call(
        k_loop,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((R,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx))

    # 4. one-hot matmul gather (MXU) — known-lowerable yardstick
    def k_onehot(tab_ref, idx_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        oh = (iota == idx_ref[...][:, None]).astype(jnp.float32)
        out_ref[...] = jnp.dot(oh, tab_ref[...],
                               preferred_element_type=jnp.float32)

    probe("onehot_matmul", lambda: pl.pallas_call(
        k_onehot,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx))

    # correctness of whichever path ran is eyeballed against ref[:4]
    print("ref   ", ref.ravel()[:4], flush=True)

    # XLA yardstick at production size: (1.17M, 32) row gather
    NE, NS, WW = 44928, 26, 32
    big_tab = jax.random.normal(key, (200_000, WW), jnp.float32)
    big_idx = jax.random.randint(jax.random.PRNGKey(2), (NE, NS), 0,
                                 200_000, jnp.int32)

    @jax.jit
    def xla_gather(t, ix):
        def body(c, _):
            g = jnp.take(t, ix, axis=0)
            return c + 1e-30 * jnp.sum(g), None
        o, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return o

    r = xla_gather(big_tab, big_idx)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(xla_gather(big_tab, big_idx))
    dt = (time.perf_counter() - t0) / 10
    gb = NE * NS * WW * 4 / 1e9
    print(f"xla row-gather (44928x26 rows of {WW}): {dt*1e3:.2f} ms "
          f"({gb/dt:.1f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
