"""Attribute the unstructured restriction cost (VERDICT r3 #4 / SURVEY
hard-part #1): which part of the E-vector gather/scatter actually costs
what on cylinder8_44928e deg 4?

Scan-amortized pieces on the hot structured path (ops/structured.py):
  s_gather       entity-row takes + orientation perms + concat
  s_gather_take  the single take(tab, ids) alone (no perms)
  s_scatter      gather-sum transpose
  s_roundtrip    both
plus the generic Restriction (ops/restriction.py) round trip that
BENCH_r03 reported (apples-to-apples with the old number), and the full
row apply for the share computation.

Couplings are `carry + 1e-30 * sum(piece_output)`: the sum defeats DCE of
the measured op; its own cost (~1 ms at these sizes) is included in every
piece equally.

Writes results/RESTRICTION_PROFILE.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

MESH = "/root/reference/meshes/cylinder8_44928e_2ss_us.exo"


RTT = [0.0]


def _rtt():
    """Tunnel round-trip cost of an empty jitted call + scalar fetch."""
    nop = jax.jit(lambda x: jnp.sum(x))
    z = jnp.zeros((8,), jnp.float32)
    float(nop(z))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(nop(z))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_time(fn_one, x0, args, R=16):
    """fn_one(carry, *args) -> array sum-coupled into the carry.

    Sync discipline (round-5 finding): on this tunneled backend
    block_until_ready does NOT reliably block — the only trustworthy sync
    is fetching a SCALAR to the host. The jitted scan therefore reduces to
    one scalar; the ~23 ms tunnel RTT is measured and subtracted."""

    @jax.jit
    def many(x, a):
        def body(c, _):
            r = fn_one(c, *a)
            # roll-by-data-dependent-zero coupling: XLA commutes
            # gather(x + broadcast(s)) = gather(x) + s and would hoist a
            # sum-coupled gather as loop-invariant; it cannot see through
            # a dynamic roll amount. Costs one streaming copy of the
            # carry per iteration (~0.25 ms at these sizes).
            zi = jnp.where(jnp.isfinite(jnp.sum(r)), 0, 1)
            return jnp.roll(c, zi, axis=-1), None
        o, _ = jax.lax.scan(body, x, None, length=R)
        return jnp.sum(o) * 1e-30

    float(many(x0, args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(x0, args))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT[0], 1e-9) / R


def gather_take_only(c, s):
    """The take(tab, ids) of gather_rows without orientation perms."""
    p = s.p
    s_e, s_f = p - 1, (p - 1) ** 2
    W = s.W

    def pad_w(x, w):
        return x if w == W else jnp.pad(x, ((0, 0), (0, W - w)))

    tab = jnp.concatenate([
        pad_w(c[: s.nverts], 3),
        pad_w(c[s.off_e:s.off_f].reshape(s.nedges, s_e * 3), s_e * 3),
        pad_w(c[s.off_f:s.off_c].reshape(s.nfaces, s_f * 3), s_f * 3),
    ], axis=0)
    return jnp.take(tab, s.ids, axis=0)


def main():
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    RTT[0] = _rtt()
    print(f"rtt_ms {RTT[0]*1e3:.2f}")

    cfg = Config(problem="hyperFS", degree=4, nu=0.3, E=1.0,
                 mesh_file=MESH, forcing="none", multigrid="none",
                 num_increments=1, bc_clamp=(998, 999),
                 bc_clamp_translate={998: (0.0, 0.0, 0.02)},
                 use_pallas=False)
    prob = ElasticityProblem(cfg)
    fes = prob.fine_space
    sr = prob.factory.fine.srestr
    restr = prob.factory.fine.restr
    nn = fes.num_nodes
    out = {"ndofs": 3 * nn, "nelem": prob.factory.nelem,
           "backend": jax.default_backend(),
           "edge_perm_count": len(sr.edge_perms),
           "face_perm_count": len(sr.face_perms)}

    key = jax.random.PRNGKey(0)
    u_rows = jax.random.normal(key, (nn, 3), prob.dtype)
    ve = jax.random.normal(key, (sr.nelem, sr.P3 * 3), prob.dtype)
    u = u_rows.T

    out["s_gather_ms"] = scan_time(
        lambda c, s: s.gather_rows(c), u_rows, (sr,)) * 1e3
    out["s_gather_take_ms"] = scan_time(
        gather_take_only, u_rows, (sr,)) * 1e3
    out["s_scatter_ms"] = scan_time(
        lambda c, s: s.scatter_rows(c), ve, (sr,)) * 1e3
    out["s_roundtrip_ms"] = scan_time(
        lambda c, s: s.scatter_rows(s.gather_rows(c)), u_rows, (sr,)) * 1e3

    out["g_gather_ms"] = scan_time(
        lambda c, r: r.gather(c), u, (restr,)) * 1e3
    out["g_roundtrip_ms"] = scan_time(
        lambda c, r: r.scatter_add(r.gather(c)), u, (restr,)) * 1e3

    bc = prob.bc_values(1.0)
    F = prob.F
    u0 = jnp.zeros((3, nn), prob.dtype)
    out["row_apply_ms"] = scan_time(
        lambda c, bc_, F_, big: prob._nl_res_j(c, bc_, F_, big)[0],
        u0, (bc, F, prob._big)) * 1e3
    out["s_roundtrip_share_of_row"] = (
        out["s_roundtrip_ms"] / out["row_apply_ms"])

    for k, v in out.items():
        print(f"{k:28s} {v}")
    outp = Path(__file__).parent.parent / "results" / "RESTRICTION_PROFILE.json"
    outp.write_text(json.dumps(out, indent=1, default=float) + "\n")


if __name__ == "__main__":
    main()
