"""Microbench: TPU row-gather throughput (hoist-proof: feeds a gathered row
back into the table each iteration)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed_feedback(make_body, x0, reps=50, trials=5):
    """make_body(x) -> x' with a real data dependency through the op."""
    @jax.jit
    def many(x):
        def body(c, _):
            return make_body(c), None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    out = many(x0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = many(x0)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


key = jax.random.PRNGKey(0)
NTAB, NROWS = 13897, 44928

for W in (27, 32, 64, 128):
    tab0 = jax.random.normal(key, (NTAB, W), jnp.float32)
    ids = jnp.asarray(np.random.randint(0, NTAB, NROWS, dtype=np.int32))

    def body(tab, ids=ids):
        out = jnp.take(tab, ids, axis=0)          # (NROWS, W)
        # fold 3 gathered rows back into the table -> forced dependency
        return tab.at[0].set(out[117]).at[1].set(out[999])

    t = timed_feedback(body, tab0)
    mb = NROWS * W * 4 / 1e6
    print(f"take rows W={W:4d}: {t*1e3:7.3f} ms  ({mb:.1f} MB out, {mb/t/1e3:.1f} GB/s)")

# gather-sum (scatter analog): K rows summed per entity, fed back
for K, W in ((4, 27), (4, 32), (8, 32)):
    tmap = jnp.asarray(np.random.randint(0, NROWS, (NTAB, K), dtype=np.int32))
    rows0 = jax.random.normal(key, (NROWS + 1, W), jnp.float32)

    def body(rows, tmap=tmap, K=K, W=W):
        g = jnp.take(rows, tmap.reshape(-1), axis=0)
        acc = g.reshape(NTAB, K, W).sum(axis=1)
        return rows.at[0].set(acc[55]).at[1].set(acc[888])

    t = timed_feedback(body, rows0)
    print(f"gather-sum K={K} W={W}: {t*1e3:7.3f} ms")
