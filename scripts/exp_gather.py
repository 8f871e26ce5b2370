"""Close the probe/production gather gap (VERDICT r5 #2, SURVEY hard #1).

scripts/try_pallas_gather measured the production-shaped row gather
(44928 x 26 rows of 32 f32) at 42.6 GB/s from a clean materialized table;
ops/structured.py's gather_rows pays ~6.7 GB/s for the same take. The
difference: production builds `tab` INSIDE the jit (concat of padded
reshapes of L-vector slices) and XLA fuses that construction into the
gather. This script isolates each candidate cause at exact production
shapes (synthetic data, no mesh needed) and times A/B variants:

  take_clean      take from a pre-materialized table (probe condition)
  take_fusedtab   take from concat(pad(slices)) built in-jit (production)
  take_barrier    same but optimization_barrier between tab and take
  take_3sep       three separate unpadded row-takes (no concat, no pad)
  perms_where     orientation perms as an 8-way where chain (production)
  perms_taa       orientation perms as one take_along_axis
  scatter_*       transpose-side equivalents
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

E, NS = 44928, 26
NV, NEDG, NF = 48000, 141000, 137000     # entity counts, cylinder deg-4 scale
SE, SF = 3, 9                            # edge/face nodes per entity (p=4)
W = 32
NN = NV + NEDG * SE + NF * SF + E * 27   # total L-vector nodes


def timeit(fn, x0, *args, reps=10):
    """Direct async-dispatch timing: queue `reps` executions, block on the
    last. Scan-with-carry coupling is NOT safe here — XLA's algebraic
    simplifier commutes gather(x + broadcast(s)) = gather(x) + s and then
    hoists the loop-invariant gather, reporting fantasy TB/s."""
    f = jax.jit(fn)
    jax.block_until_ready(f(x0, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [f(x0, *args) for _ in range(reps)]
        jax.block_until_ready(rs[-1])
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    key = jax.random.PRNGKey(0)
    u_rows = jax.random.normal(key, (NN, 3), jnp.float32)
    ntab = NV + NEDG + NF
    tab_clean = jax.random.normal(key, (ntab, W), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (E, NS), 0, ntab,
                             jnp.int32)
    # slot-structured ids like production: 8 vert slots, 12 edge, 6 face
    ids_v = jax.random.randint(jax.random.PRNGKey(2), (E, 8), 0, NV, jnp.int32)
    ids_e = jax.random.randint(jax.random.PRNGKey(3), (E, 12), 0, NEDG,
                               jnp.int32)
    ids_f = jax.random.randint(jax.random.PRNGKey(4), (E, 6), 0, NF, jnp.int32)

    out_bytes = E * NS * W * 4 / 1e9

    t = timeit(lambda tb, ix: jnp.take(tb, ix, axis=0), tab_clean, ids)
    print(f"take_clean     {t*1e3:7.2f} ms  {out_bytes/t:6.1f} GB/s")

    off_e, off_f, off_c = NV, NV + NEDG * SE, NV + NEDG * SE + NF * SF

    def build_tab(u):
        pad = lambda x, w: jnp.pad(x, ((0, 0), (0, W - w)))  # noqa: E731
        return jnp.concatenate([
            pad(u[:NV], 3),
            pad(u[off_e:off_f].reshape(NEDG, SE * 3), SE * 3),
            pad(u[off_f:off_c].reshape(NF, SF * 3), SF * 3),
        ], axis=0)

    t = timeit(lambda u, ix: jnp.take(build_tab(u), ix, axis=0), u_rows, ids)
    print(f"take_fusedtab  {t*1e3:7.2f} ms  {out_bytes/t:6.1f} GB/s")

    t = timeit(
        lambda u, ix: jnp.take(
            jax.lax.optimization_barrier(build_tab(u)), ix, axis=0),
        u_rows, ids)
    print(f"take_barrier   {t*1e3:7.2f} ms  {out_bytes/t:6.1f} GB/s")

    def take3(u, iv, ie, if_):
        gv = jnp.take(u[:NV], iv, axis=0)
        ge = jnp.take(u[off_e:off_f].reshape(NEDG, SE * 3), ie, axis=0)
        gf = jnp.take(u[off_f:off_c].reshape(NF, SF * 3), if_, axis=0)
        return jnp.concatenate(
            [gv.reshape(E, -1), ge.reshape(E, -1), gf.reshape(E, -1)], axis=1)

    b3 = E * (8 * 3 + 12 * SE * 3 + 6 * SF * 3) * 4 / 1e9
    t = timeit(take3, u_rows, ids_v, ids_e, ids_f)
    print(f"take_3sep      {t*1e3:7.2f} ms  {b3/t:6.1f} GB/s (compact)")

    def take3b(u, iv, ie, if_):
        u = jax.lax.optimization_barrier(u)
        return take3(u, iv, ie, if_)

    t = timeit(take3b, u_rows, ids_v, ids_e, ids_f)
    print(f"take_3sep_bar  {t*1e3:7.2f} ms  {b3/t:6.1f} GB/s (compact)")

    # ---- orientation permutation variants on the face rows -------------
    fr = jax.random.normal(key, (E, 6, SF, 3), jnp.float32)
    perms = [np.random.permutation(SF) for _ in range(8)]
    sig = jax.random.randint(jax.random.PRNGKey(5), (E, 6), 0, 8, jnp.int32)
    fb = E * 6 * SF * 3 * 4 / 1e9

    def perms_where(r, sg):
        o = r[:, :, jnp.asarray(perms[0]), :]
        for i in range(1, 8):
            c = r[:, :, jnp.asarray(perms[i]), :]
            o = jnp.where((sg == i)[:, :, None, None], c, o)
        return o

    t = timeit(perms_where, fr, sig)
    print(f"perms_where    {t*1e3:7.2f} ms  {fb/t:6.1f} GB/s")

    ptab = jnp.asarray(np.stack(perms), jnp.int32)       # (8, SF)

    def perms_taa(r, sg):
        ix = ptab[sg]                                    # (E, 6, SF)
        return jnp.take_along_axis(r, ix[..., None], axis=2)

    t = timeit(perms_taa, fr, sig)
    print(f"perms_taa      {t*1e3:7.2f} ms  {fb/t:6.1f} GB/s")

    # ---- scatter side --------------------------------------------------
    K = 8
    tmap = jax.random.randint(jax.random.PRNGKey(6), (NF, K), 0, E * 6,
                              jnp.int32)
    rows_flat = jax.random.normal(key, (E * 6, SF * 3), jnp.float32)
    sb = NF * K * W * 4 / 1e9

    def gsum_prod(rf, tm):
        wp = W
        rf = jnp.pad(rf, ((0, 0), (0, wp - SF * 3)))
        ext = jnp.concatenate([rf, jnp.zeros((1, wp), rf.dtype)], axis=0)
        g = jnp.take(ext, tm.reshape(-1), axis=0)
        return g.reshape(NF, K, wp).sum(axis=1)[:, :SF * 3]

    t = timeit(gsum_prod, rows_flat, tmap)
    print(f"scat_padsum    {t*1e3:7.2f} ms  {sb/t:6.1f} GB/s")

    def gsum_bar(rf, tm):
        wp = W
        rf = jnp.pad(rf, ((0, 0), (0, wp - SF * 3)))
        ext = jnp.concatenate([rf, jnp.zeros((1, wp), rf.dtype)], axis=0)
        ext = jax.lax.optimization_barrier(ext)
        g = jnp.take(ext, tm.reshape(-1), axis=0)
        return g.reshape(NF, K, wp).sum(axis=1)[:, :SF * 3]

    t = timeit(gsum_bar, rows_flat, tmap)
    print(f"scat_padsum_b  {t*1e3:7.2f} ms  {sb/t:6.1f} GB/s")

    def gsum_compact(rf, tm):
        ext = jnp.concatenate(
            [rf, jnp.zeros((1, SF * 3), rf.dtype)], axis=0)
        ext = jax.lax.optimization_barrier(ext)
        g = jnp.take(ext, tm.reshape(-1), axis=0)
        return g.reshape(NF, K, SF * 3).sum(axis=1)

    cb = NF * K * SF * 3 * 4 / 1e9
    t = timeit(gsum_compact, rows_flat, tmap)
    print(f"scat_compact_b {t*1e3:7.2f} ms  {cb/t:6.1f} GB/s (compact)")

    # segment-sum alternative: sort-free jax.ops.segment_sum over rows
    seg_ids = jax.random.randint(jax.random.PRNGKey(7), (E * 6,), 0, NF,
                                 jnp.int32)

    def seg(rf, si):
        return jax.ops.segment_sum(rf, si, num_segments=NF)

    t = timeit(seg, rows_flat, seg_ids)
    print(f"scat_segsum    {t*1e3:7.2f} ms  {cb/t:6.1f} GB/s (compact)")


if __name__ == "__main__":
    main()
