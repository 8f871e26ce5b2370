"""Attribute the ndev=1 SPMD overhead (VERDICT r3 #6): BENCH_r03 measured
the distributed slab residual at 6.1x the serial spectral apply on the
same 24^3 box. This times the slab pipeline STAGE BY STAGE under the same
shard_map/jit wrapping, scan-amortized, so the delta between consecutive
stages attributes the overhead:

  s0_shardmap      carry-only (shard_map + scan floor)
  s1_g2l           ghost all_to_all + local assembly
  s2_lattice       + [ghost|owned] -> dense lattice shuffle
  s3_grad          + spectral forward GEMMs
  s4_physics       + hyperFS residual planes
  s5_gradT         + spectral adjoint GEMMs
  s6_adjoint       + lattice -> [owned|ghost] shuffle
  s7_l2g           + owner-sum all_to_all (= full residual)
  full_resid       dp._resid_sm as the bench measures it

All stages sum-couple their output into the carry (uniform ~0.5 ms cost).
Writes results/DIST1_PROFILE.json.  Run on the TPU backend.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def timeit(fn, reps=3, warmup=1):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
    from ceedpetscsolid_tpu.parallel.driver import DistributedProblem
    from ceedpetscsolid_tpu.parallel import dist, slab as slab_mod
    from ceedpetscsolid_tpu.utils.precise import accurate_matmuls

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    faces = (n, n, n)
    cfg = Config(problem="hyperFS", degree=4, nu=0.3, E=1.0, test_mode=True,
                 box_faces=faces, multigrid="none", num_increments=1)
    prob = ElasticityProblem(cfg)
    dp = DistributedProblem(prob, ndev=1)
    assert dp.slab is not None, "slab path required"
    slab = dp.slab
    ssp = slab.sp
    sNP, sNyNx = slab.NP, slab.NyNx
    model = dp.model
    phys = dp.phys
    sa = dp.sa
    R = 20

    u = dp.to_owned(np.zeros((3, prob.fine_space.num_nodes), prob.dtype))
    slabd = dp._slabd
    smats2 = dp._smats2
    out = {"ndofs": 3 * prob.fine_space.num_nodes,
           "backend": jax.default_backend()}

    def staged(upto):
        """Build the slab residual truncated after stage `upto`."""

        def body(owned, sa_, slabd_, smats2_):
            with accurate_matmuls():
                qdl = slabd_["qd"][0]
                isf = slabd_["isf"][0, 0]
                toff = slabd_["toff"][0, 0]
                smats = smats2_[0]
                ndev = 1
                x = owned
                if upto >= 2:      # halo_fwd (stages 1+2 merged: the
                    #                ppermute halo replaced g2l+lattice)
                    x = slab_mod.halo_fwd(dist._blk(owned), isf, toff,
                                          ndev, dist.AXIS, sNP, sNyNx)
                elif upto >= 1:
                    x = dist._blk(owned)
                if upto >= 3:
                    x = ssp.grad(x, smats)
                if upto >= 4:
                    dv, _ = model.residual_planes(x, qdl, phys)
                    x = dv
                if upto >= 5:
                    x = ssp.grad_T(dv, smats)
                if upto >= 7:      # halo_adj (stages 6+7 merged)
                    x = slab_mod.halo_adj(x, isf, toff, ndev, dist.AXIS,
                                          sNP, sNyNx, sa_.n_owned_max)
                if hasattr(x, "m"):                   # Mat3
                    s = sum(jnp.sum(p) for p in x.m)
                else:
                    s = jnp.sum(x)
                return s[None]                        # (1,) per shard

        sm = jax.shard_map(
            body, mesh=dp.mesh,
            in_specs=(P(dist.AXIS), P(dist.AXIS), P(dist.AXIS), P()),
            out_specs=P(dist.AXIS),
        )

        @jax.jit
        def many(u0, sa_, slabd_, smats2_):
            def sbody(c, _):
                s = sm(c, sa_, slabd_, smats2_)
                return c + 1e-30 * jnp.sum(s), None
            o, _ = jax.lax.scan(sbody, u0, None, length=R)
            return o

        return lambda: many(u, sa, slabd, smats2)

    names = ["s0_shardmap", "s1_g2l", "s2_lattice", "s3_grad", "s4_physics",
             "s5_gradT", "s6_adjoint", "s7_l2g"]
    prev = None
    for i, name in enumerate(names):
        t = timeit(staged(i)) / R * 1e3
        out[name + "_ms"] = round(t, 3)
        if prev is not None:
            out[name + "_delta_ms"] = round(t - prev, 3)
        prev = t
        print(f"{name:14s} {t:8.3f} ms", flush=True)

    # the bench surface
    bc = dp.to_owned(prob.bcs.values(prob._coords, 1.0).T.astype(prob.dtype))
    args = (bc, dp.F_sh, dp.mask_sh, dp.qdata_sh, dp.qdata_p_sh, dp.sa,
            dp._sgrads[-1], dp.sgrads_p[-1] if dp.composite else None,
            dp._slabd, dp._smats2)

    @jax.jit
    def many_full(u0, a):
        def sbody(c, _):
            r = dp._resid_sm(c, *a)
            return c + 1e-30 * r, None
        o, _ = jax.lax.scan(sbody, u0, None, length=R)
        return o

    out["full_resid_ms"] = round(timeit(lambda: many_full(u, args)) / R * 1e3,
                                 3)
    print(f"full_resid     {out['full_resid_ms']:8.3f} ms", flush=True)

    # serial yardstick
    us = jnp.zeros((3, prob.fine_space.num_nodes), prob.dtype)
    bcs = prob.bc_values(1.0)

    @jax.jit
    def many_serial(u0, bc_, F_, big):
        def sbody(c, _):
            r = prob._nl_res_j(c, bc_, F_, big)[0]
            return c + 1e-30 * jnp.sum(r), None
        o, _ = jax.lax.scan(sbody, u0, None, length=R)
        return o

    out["serial_resid_ms"] = round(
        timeit(lambda: many_serial(us, bcs, prob.F, prob._big)) / R * 1e3, 3)
    out["overhead_x"] = round(out["full_resid_ms"] / out["serial_resid_ms"],
                              3)
    print(f"serial         {out['serial_resid_ms']:8.3f} ms  "
          f"overhead {out['overhead_x']}x", flush=True)

    outp = Path(__file__).parent.parent / "results" / "DIST1_PROFILE.json"
    outp.write_text(json.dumps(out, indent=1, default=float) + "\n")


if __name__ == "__main__":
    main()
