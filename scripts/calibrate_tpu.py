"""Calibrate the TPU measurement harness: scan-loop floor, raw GEMM
throughput at pipeline shapes, dispatch latency, and dtype sanity."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, x0, reps=30, trials=3):
    @jax.jit
    def many(x):
        def body(c, _):
            y = fn(c)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(y)) * 1e-30
            return jax.tree.map(lambda a: a + s, c), None
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
    return sorted(ts)[len(ts) // 2]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    dt = jnp.float32
    rng = np.random.default_rng(0)

    # 1. empty-ish op: the scan-harness floor
    x = jnp.asarray(rng.standard_normal((1728, 375)), dt)
    t = scan_time(lambda a: a * 1.000001, x)
    print(f"floor (elementwise 2.6MB): {t*1e6:8.1f} us")

    # 2. raw GEMM at pipeline shape (e,375)@(375,1125)
    K = jnp.asarray(rng.standard_normal((375, 1125)), dt)
    t = scan_time(lambda a: a @ K, x)
    fl = 2 * 1728 * 375 * 1125
    print(f"gemm (1728,375)@(375,1125): {t*1e6:8.1f} us -> {fl/t/1e12:6.2f} TF/s")

    # 3. same GEMM, bigger batch
    x8 = jnp.asarray(rng.standard_normal((1728 * 8, 375)), dt)
    t = scan_time(lambda a: a @ K, x8)
    print(f"gemm (13824,375)@(375,1125): {t*1e6:8.1f} us -> {8*fl/t/1e12:6.2f} TF/s")

    # 4. big square GEMM: peak check
    a = jnp.asarray(rng.standard_normal((4096, 4096)), dt)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), dt)
    t = scan_time(lambda m: m @ b, a)
    print(f"gemm 4096^3 f32: {t*1e6:8.1f} us -> {2*4096**3/t/1e12:6.2f} TF/s")
    abf = a.astype(jnp.bfloat16)
    bbf = b.astype(jnp.bfloat16)
    t = scan_time(lambda m: m @ bbf, abf)
    print(f"gemm 4096^3 bf16: {t*1e6:8.1f} us -> {2*4096**3/t/1e12:6.2f} TF/s")

    # 5. HBM bandwidth: big copy
    big = jnp.asarray(rng.standard_normal((64 * 1024 * 1024 // 4,)), dt)  # 64MB
    t = scan_time(lambda m: m * 1.000001, big)
    print(f"elementwise 64MB: {t*1e6:8.1f} us -> {2*big.nbytes/t/1e9:6.1f} GB/s")

    # 6. dispatch latency (Python loop, tiny op)
    f = jax.jit(lambda a: a * 1.000001)
    y = f(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(100):
        y = f(y)
    jax.block_until_ready(y)
    print(f"dispatch+tiny op: {(time.perf_counter()-t0)/100*1e6:8.1f} us")


if __name__ == "__main__":
    main()
