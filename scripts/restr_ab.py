"""Honest (chained-scan, scalar-sync) A/B timing of the production
entity-row restriction on the flagship cylinder mesh (SURVEY hard #1,
VERDICT r5 item 2).

Round-5 finding: on the tunneled TPU, dispatch timing with
block_until_ready reports fantasy numbers — every measurement here runs
`reps` iterations inside one jit, serially coupled through an
optimization_barrier, and syncs by fetching one scalar.

Variants:
  gather: production | flat-ids | flat-ids+barrier-tab
  scatter: production | barrier-ext | unified-1-take
  perms:  where-chain | matmul+select
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax, jax.numpy as jnp, numpy as np

MESH = "/root/reference/meshes/cylinder8_44928e_2ss_us.exo"

def chain(fn, args, reps=10):
    @jax.jit
    def run(a):
        def body(c, _):
            aa = jax.lax.optimization_barrier(tuple(a) + (c,))
            r = fn(*aa[:-1])
            s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(r)
                    if jnp.issubdtype(x.dtype, jnp.floating))
            return aa[-1] + 1e-30*s.astype(jnp.float32), None
        o, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return o
    float(run(args))
    best = 1e9
    for _ in range(2):
        t0=time.perf_counter(); float(run(args)); best=min(best, time.perf_counter()-t0)
    return best/reps

def main():
    from ceedpetscsolid_tpu.mesh.exodus import read_exodus
    from ceedpetscsolid_tpu.mesh.fespace import build_fespace
    from ceedpetscsolid_tpu.mesh.reorder import reorder_mesh
    from ceedpetscsolid_tpu.ops.structured import (
        StructuredMaps, StructuredRestriction)

    t0 = time.time()
    mesh = read_exodus(MESH)
    try:
        mesh = reorder_mesh(mesh)
    except Exception as e:
        print("reorder skipped:", repr(e)[:120])
    fes = build_fespace(mesh, 4)
    maps = StructuredMaps(fes)
    sr = StructuredRestriction(maps)
    print(f"setup {time.time()-t0:.1f}s  nelem={maps.nelem} nodes={maps.num_nodes}")
    print(f"nverts={maps.nverts} nedges={maps.nedges} nfaces={maps.nfaces}")
    print(f"tmap K: vert={maps.vert_tmap.shape[1]} edge={maps.edge_tmap.shape[1]} face={maps.face_tmap.shape[1]}")
    print(f"perm counts: edge={len(sr.edge_perms)} face={len(sr.face_perms)}")

    u = jax.random.normal(jax.random.PRNGKey(0), (maps.num_nodes, 3), jnp.float32)
    dt = chain(lambda uu, r: r.gather_rows(uu), (u, sr))
    print(f"gather production:      {dt*1e3:7.2f} ms")

    ve = jax.random.normal(jax.random.PRNGKey(1), (maps.nelem, sr.P3*3), jnp.float32)
    dt = chain(lambda vv, r: r.scatter_rows(vv), (ve, sr))
    print(f"scatter production:     {dt*1e3:7.2f} ms")

    dt = chain(lambda uu, r: r.scatter_rows(r.gather_rows(uu)), (u, sr))
    print(f"roundtrip production:   {dt*1e3:7.2f} ms")


# ---------------------------------------------------------------------
# Optimized variants (candidates for ops/structured.py)
# ---------------------------------------------------------------------

def opt_gather(u_rows, sr, barrier=True):
    """flat-ids take + matmul+select perms."""
    p, nelem, W = sr.p, sr.nelem, sr.W
    s_e, s_f, s_c = p-1, (p-1)**2, (p-1)**3
    def pad_w(x, w):
        return x if w == W else jnp.pad(x, ((0,0),(0,W-w)))
    tab = jnp.concatenate([
        pad_w(u_rows[:sr.nverts], 3),
        pad_w(u_rows[sr.off_e:sr.off_f].reshape(sr.nedges, s_e*3), s_e*3),
        pad_w(u_rows[sr.off_f:sr.off_c].reshape(sr.nfaces, s_f*3), s_f*3),
    ], axis=0)
    if barrier:
        tab = jax.lax.optimization_barrier(tab)
    rows = jnp.take(tab, sr.ids.reshape(-1), axis=0).reshape(nelem, 26, W)
    vr = rows[:, :8, :3]
    er = rows[:, 8:20, :s_e*3].reshape(nelem, 12, s_e, 3)
    er = sr._apply_perms(er, sr.edge_perms, sr.e_sig)
    fr = rows[:, 20:, :s_f*3].reshape(nelem, 6, s_f, 3)
    fr = sr._apply_perms(fr, sr.face_perms, sr.f_sig)
    return jnp.concatenate([
        vr.reshape(nelem, -1), er.reshape(nelem, -1), fr.reshape(nelem, -1),
        u_rows[sr.off_c:].reshape(nelem, s_c*3)], axis=1)

def _perm_mats(perms, s, sub, W):
    """(n_perm, W, W) permutation matrices acting on rows (sub-blocked:
    value j of node perm[i] goes to position i) padded to W lanes."""
    mats = []
    for pm in perms:
        M = np.zeros((W, W), np.float32)
        for i, src in enumerate(pm):
            for c in range(sub):
                M[src*sub + c, i*sub + c] = 1.0
        mats.append(M)
    return jnp.asarray(np.stack(mats))

def opt_gather_mm(u_rows, sr, fmats, emats):
    """flat-ids take + MXU perms (rows @ P_o, 8-way select on GEMM outputs)."""
    p, nelem, W = sr.p, sr.nelem, sr.W
    s_e, s_f, s_c = p-1, (p-1)**2, (p-1)**3
    def pad_w(x, w):
        return x if w == W else jnp.pad(x, ((0,0),(0,W-w)))
    tab = jnp.concatenate([
        pad_w(u_rows[:sr.nverts], 3),
        pad_w(u_rows[sr.off_e:sr.off_f].reshape(sr.nedges, s_e*3), s_e*3),
        pad_w(u_rows[sr.off_f:sr.off_c].reshape(sr.nfaces, s_f*3), s_f*3),
    ], axis=0)
    tab = jax.lax.optimization_barrier(tab)
    rows = jnp.take(tab, sr.ids.reshape(-1), axis=0).reshape(nelem, 26, W)
    vr = rows[:, :8, :3]
    er = rows[:, 8:20, :].reshape(nelem*12, W)
    if len(sr.edge_perms) > 1:
        ecand = jnp.einsum('rw,owv->orv', er, emats)
        eo = ecand[0]
        esig = sr.e_sig.reshape(-1)
        for o in range(1, len(sr.edge_perms)):
            eo = jnp.where((esig == o)[:, None], ecand[o], eo)
    else:
        eo = er
    fr = rows[:, 20:, :].reshape(nelem*6, W)
    fcand = jnp.einsum('rw,owv->orv', fr, fmats)
    fo = fcand[0]
    fsig = sr.f_sig.reshape(-1)
    for o in range(1, len(sr.face_perms)):
        fo = jnp.where((fsig == o)[:, None], fcand[o], fo)
    return jnp.concatenate([
        vr.reshape(nelem, -1),
        eo.reshape(nelem, 12, W)[:, :, :s_e*3].reshape(nelem, -1),
        fo.reshape(nelem, 6, W)[:, :, :s_f*3].reshape(nelem, -1),
        u_rows[sr.off_c:].reshape(nelem, s_c*3)], axis=1)

def build_unified_tmap(maps):
    """One scatter map over the unified padded E-row table: flat row id =
    e*26 + slot (sentinel = nelem*26). Returns (tmap_v, tmap_e, tmap_f)
    re-indexed into the unified rows."""
    # vert rows are slots 0..7, edge slots 8..19, face slots 20..25
    def remap(tmap, ns, slot0, nent):
        e_ns = tmap // ns + 0   # not valid: tmap holds flat e*ns + k positions
        return None
    return None

def opt_scatter(ve, sr, uni_v, uni_e, uni_f, fmats_inv, emats_inv):
    """Single unified padded row table + one take per class from it, with
    MXU inverse perms applied to the (e, ns, W) row blocks first."""
    p, nelem, W = sr.p, sr.nelem, sr.W
    s_e, s_f = p-1, (p-1)**2
    o1 = 8*3
    o2 = o1 + 12*s_e*3
    o3 = o2 + 6*s_f*3
    # re-block ve into per-slot rows padded to W
    vr = ve[:, :o1].reshape(nelem*8, 3)
    vr = jnp.pad(vr, ((0,0),(0,W-3)))
    er = ve[:, o1:o2].reshape(nelem*12, s_e*3)
    er = jnp.pad(er, ((0,0),(0,W-s_e*3)))
    if len(sr.edge_perms) > 1:
        ecand = jnp.einsum('rw,owv->orv', er, emats_inv)
        esig = sr.e_sig.reshape(-1)
        eo = ecand[0]
        for o in range(1, len(sr.edge_perms)):
            eo = jnp.where((esig == o)[:, None], ecand[o], eo)
        er = eo
    fr = ve[:, o2:o3].reshape(nelem*6, s_f*3)
    fr = jnp.pad(fr, ((0,0),(0,W-s_f*3)))
    fcand = jnp.einsum('rw,owv->orv', fr, fmats_inv)
    fsig = sr.f_sig.reshape(-1)
    fo = fcand[0]
    for o in range(1, len(sr.face_perms)):
        fo = jnp.where((fsig == o)[:, None], fcand[o], fo)
    fr = fo
    ext = jnp.concatenate([vr, er, fr, jnp.zeros((1, W), ve.dtype)], axis=0)
    ext = jax.lax.optimization_barrier(ext)
    def gsum(tmap, width):
        nent, K = tmap.shape
        g = jnp.take(ext, tmap.reshape(-1), axis=0)
        return g.reshape(nent, K, W).sum(axis=1)[:, :width]
    pv = gsum(uni_v, 3)
    pe = gsum(uni_e, s_e*3).reshape(-1, 3)
    pf = gsum(uni_f, s_f*3).reshape(-1, 3)
    pi = ve[:, o3:].reshape(-1, 3)
    return jnp.concatenate([pv, pe, pf, pi], axis=0)

def unified_tmaps(maps):
    """Remap the per-class transpose maps into the unified row table
    [vert rows (e*8) | edge rows (e*12) | face rows (e*6) | zero].
    Class tmaps hold positions into flat (e, ns) arrays."""
    e = maps.nelem
    def remap(tm, ns, base, sent_old):
        ee, kk = tm // ns, tm % ns    # element, slot within class
        out = base + ee * ns + kk
        out[tm == sent_old] = e*26    # unified sentinel = last row (zero)
        return out.astype(np.int32)
    tv = remap(maps.vert_tmap.copy(), 8, 0, e*8)
    te = remap(maps.edge_tmap.copy(), 12, e*8, e*12)
    tf = remap(maps.face_tmap.copy(), 6, e*8 + e*12, e*6)
    return jnp.asarray(tv), jnp.asarray(te), jnp.asarray(tf)

def main2():
    from ceedpetscsolid_tpu.mesh.exodus import read_exodus
    from ceedpetscsolid_tpu.mesh.fespace import build_fespace
    from ceedpetscsolid_tpu.mesh.reorder import reorder_mesh
    from ceedpetscsolid_tpu.ops.structured import (
        StructuredMaps, StructuredRestriction)

    t0 = time.time()
    mesh = reorder_mesh(read_exodus(MESH))
    fes = build_fespace(mesh, 4)
    maps = StructuredMaps(fes)
    sr = StructuredRestriction(maps)
    print(f"setup {time.time()-t0:.1f}s")
    p = sr.p
    s_e, s_f = p-1, (p-1)**2
    u = jax.random.normal(jax.random.PRNGKey(0), (maps.num_nodes, 3), jnp.float32)
    ve = jax.random.normal(jax.random.PRNGKey(1), (maps.nelem, sr.P3*3), jnp.float32)

    # correctness refs
    ref_g = np.asarray(sr.gather_rows(u))
    ref_s = np.asarray(sr.scatter_rows(ve))

    g1 = opt_gather(u, sr, barrier=True)
    print("opt_gather correct:", np.allclose(np.asarray(g1), ref_g))
    dt = chain(lambda uu, r: opt_gather(uu, r, barrier=True), (u, sr))
    print(f"gather flat+barrier:    {dt*1e3:7.2f} ms")
    dt = chain(lambda uu, r: opt_gather(uu, r, barrier=False), (u, sr))
    print(f"gather flat nobarrier:  {dt*1e3:7.2f} ms")

    fmats = _perm_mats(sr.face_perms, s_f, 3, sr.W)
    emats = _perm_mats(sr.edge_perms, s_e, 3, sr.W)
    g2 = opt_gather_mm(u, sr, fmats, emats)
    print("opt_gather_mm correct:", np.allclose(np.asarray(g2), ref_g))
    dt = chain(lambda uu, r, fm, em: opt_gather_mm(uu, r, fm, em), (u, sr, fmats, emats))
    print(f"gather flat+mmperm:     {dt*1e3:7.2f} ms")

    # inverse perm mats = transpose
    fmats_inv = jnp.transpose(fmats, (0, 2, 1))
    emats_inv = jnp.transpose(emats, (0, 2, 1))
    uni_v, uni_e, uni_f = unified_tmaps(maps)
    s1 = opt_scatter(ve, sr, uni_v, uni_e, uni_f, fmats_inv, emats_inv)
    print("opt_scatter correct:", np.allclose(np.asarray(s1), ref_s, atol=1e-4))
    dt = chain(lambda vv, r, a, b, c, fm, em: opt_scatter(vv, r, a, b, c, fm, em),
               (ve, sr, uni_v, uni_e, uni_f, fmats_inv, emats_inv))
    print(f"scatter unified+mmperm: {dt*1e3:7.2f} ms")

    # roundtrip
    dt = chain(lambda uu, r, a, b, c, fm, em, fmi, emi:
               opt_scatter(opt_gather_mm(uu, r, fm, em), r, a, b, c, fmi, emi),
               (u, sr, uni_v, uni_e, uni_f, fmats, emats, fmats_inv, emats_inv))
    print(f"roundtrip optimized:    {dt*1e3:7.2f} ms")

if __name__ == "__main__":
    main2() if len(sys.argv) > 1 else main()
