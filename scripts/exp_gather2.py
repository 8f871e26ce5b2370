"""Bulletproof gather microbenchmarks (VERDICT r5 #2 groundwork).

Timing rules learned the hard way on the tunneled chip:
  * scan + scalar-sum coupling: XLA commutes gather(x + broadcast(s)) =
    gather(x) + s and HOISTS the loop-invariant gather (r4's "42.6 GB/s
    probe" measured ONE gather over 10 reps — an artifact);
  * direct re-dispatch of identical args: the runtime caches results.
  Here every iteration's SOURCE is jnp.roll(src, c, axis=0) with c a
  data-dependent always-zero int32 — a dynamic-slice XLA cannot see
  through — so the measured op re-executes every iteration. The roll
  itself costs one streaming copy of src; 'stream' measures that floor
  and is subtracted where quoted as '- roll'.

Questions answered at cylinder8_44928e deg-4 production scale:
  1. What is the chip's streaming copy rate in this harness?
  2. Is the XLA row-gather byte-bound or ROW-COUNT-bound? (time vs width
     at fixed count, time vs count at fixed width)
  3. Do sorted (monotonic) indices beat random?
  4. What do the production-shaped gather (1.17M rows of 32) and scatter
     (padded take + reshape-sum) really cost?
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 16
RTT = [0.0]


def timeit(fn, src, *args):
    """fn(src_rolled, *args) -> array; returns seconds/iter including one
    roll (streaming copy) of src.

    Sync discipline (this tunneled backend): block_until_ready does NOT
    block, and repeated identical dispatches can be served from cache —
    the ONLY reliable sync is fetching a scalar to the host. Each timed
    call therefore returns a device-accumulated scalar that is float()ed;
    the ~25 ms tunnel round trip is amortized by REPS in-jit iterations
    and subtracted via the measured empty-scan baseline."""

    @jax.jit
    def many(s0, a):
        def body(c, _):
            s = jnp.roll(s0, c[1], axis=0)
            r = fn(s, *a)
            z = jnp.where(jnp.isfinite(jnp.sum(r)), 0, 1).astype(jnp.int32)
            return (c[0] + jnp.sum(r[0]), z), None
        o, _ = jax.lax.scan(body, (jnp.float32(0), jnp.int32(0)), None,
                            length=REPS)
        return o[0]

    float(many(src, args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(src, args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT[0], 1e-9) / REPS


def rtt_baseline():
    """Measured cost of an (almost) empty jitted call + scalar fetch."""
    @jax.jit
    def nop(x):
        return jnp.sum(x)
    z = jnp.zeros((8,), jnp.float32)
    float(nop(z))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(nop(z))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    RTT[0] = rtt_baseline()
    print(f"rtt baseline     {RTT[0]*1e3:7.2f} ms", flush=True)

    # 1. streaming floor: roll + elementwise on a 42 MB table
    NT, W0 = 326_000, 32
    tab = jax.random.normal(key, (NT, W0), jnp.float32)
    t = timeit(lambda s: s * 1.0001, tab)
    gb = NT * W0 * 4 / 1e9
    print(f"stream(copy+mul) {t*1e3:7.2f} ms  {3*gb/t:6.1f} GB/s "
          f"(roll r/w + mul r/w ~ {3*gb:.2f} GB)", flush=True)
    t_roll = t

    # 2. row-gather: fixed output bytes (150 MB), varying width
    for R, W in ((1_168_000, 32), (292_000, 128), (73_000, 512),
                 (4_672_000, 8)):
        ntab = max(1000, NT * W0 // W)
        tb = jax.random.normal(key, (ntab, W), jnp.float32)
        ix = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, ntab,
                                jnp.int32)
        t = timeit(lambda s, i: jnp.take(s, i, axis=0), tb, ix)
        print(f"take R={R/1e6:4.2f}M W={W:4d}  {t*1e3:7.2f} ms  "
              f"{R*W*4/1e9/t:6.1f} GB/s  {t/R*1e9:6.1f} ns/row", flush=True)

    # 3. sorted vs random at production shape
    R, W = 1_168_000, 32
    tb = jax.random.normal(key, (NT, W), jnp.float32)
    ix_r = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, NT, jnp.int32)
    ix_s = jnp.sort(ix_r)
    for name, ix in (("random", ix_r), ("sorted", ix_s)):
        t = timeit(lambda s, i: jnp.take(s, i, axis=0), tb, ix)
        print(f"take {name}       {t*1e3:7.2f} ms  {R*W*4/1e9/t:6.1f} GB/s",
              flush=True)

    # 4. production scatter shape: padded take + reshape-sum (faces class:
    # 137k entities x K=2 + edges 141k x K=4 + verts 48k x K=8)
    for nent, K, w in ((137_000, 2, 32), (141_000, 4, 32), (48_000, 8, 8)):
        rows = jax.random.normal(key, (1_200_000, w), jnp.float32)
        tm = jax.random.randint(jax.random.PRNGKey(2), (nent, K), 0,
                                1_200_000, jnp.int32)

        def gsum(s, t_):
            g = jnp.take(s, t_.reshape(-1), axis=0)
            return g.reshape(nent, K, w).sum(axis=1)

        t = timeit(gsum, rows, tm)
        print(f"scat n={nent//1000}k K={K} w={w}  {t*1e3:7.2f} ms  "
              f"{nent*K*w*4/1e9/t:6.1f} GB/s  {t/(nent*K)*1e9:6.1f} ns/row",
              flush=True)

    # 5. dynamic-slice contiguous-run copy: the extruded-mesh idea's
    # primitive — gather of 235k CONTIGUOUS runs of 160 f32 (5 z-nodes x
    # 32) expressed as take of a reshaped (ntab/5, 160) table
    tb5 = jax.random.normal(key, (65_200, 160), jnp.float32)
    ix5 = jax.random.randint(jax.random.PRNGKey(3), (233_600,), 0, 65_200,
                             jnp.int32)
    t = timeit(lambda s, i: jnp.take(s, i, axis=0), tb5, ix5)
    print(f"take R=0.23M W=160 {t*1e3:7.2f} ms  "
          f"{233_600*160*4/1e9/t:6.1f} GB/s  {t/233_600*1e9:6.1f} ns/row",
          flush=True)


if __name__ == "__main__":
    main()
