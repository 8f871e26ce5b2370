"""v3 restriction prototype (SURVEY hard #1): per-class UNPADDED takes
(every table below the ~40 MB row-gather cliff measured in round 5),
matmul+select orientation perms, class-split scatter with masked sums.
Validated per class against the production StructuredRestriction."""
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

def perm_mats(perms, s, W):
    """(n_perm, W, W) lane matrices: out[:, i*3+c] = in[:, perm[i]*3+c]."""
    mats = []
    for pm in perms:
        M = np.zeros((W, W), np.float32)
        for i, src in enumerate(pm):
            for c in range(3):
                M[src*3 + c, i*3 + c] = 1.0
        mats.append(M)
    return jnp.asarray(np.stack(mats))

def main():
    from ceedpetscsolid_tpu.mesh.exodus import read_exodus
    from ceedpetscsolid_tpu.mesh.fespace import build_fespace
    from ceedpetscsolid_tpu.mesh.reorder import reorder_mesh
    from ceedpetscsolid_tpu.ops.structured import StructuredMaps, StructuredRestriction

    mesh = reorder_mesh(read_exodus(MESH))
    fes = build_fespace(mesh, 4)
    maps = StructuredMaps(fes)
    sr = StructuredRestriction(maps)
    p, nelem = sr.p, sr.nelem
    s_e, s_f, s_c = p-1, (p-1)**2, (p-1)**3
    we, wf = s_e*3, s_f*3          # 9, 27
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (maps.num_nodes, 3), jnp.float32)
    print(f"setup done. nelem={nelem}")

    # per-class id tables (element-slot -> entity id), from maps
    vid = jnp.asarray(maps.vert_ids)                    # (e, 8)
    eid = jnp.asarray(maps.edge_ids)                    # (e, 12)
    fid = jnp.asarray(maps.face_ids)                    # (e, 6)
    e_sig = jnp.asarray(maps.edge_sig)                  # (e, 12)
    f_sig = jnp.asarray(maps.face_sig)                  # (e, 6)
    pe = perm_mats(sr.edge_perms, s_e, we)              # (2, 9, 9)
    pf = perm_mats(sr.face_perms, s_f, wf)              # (8, 27, 27)

    def gather_v3(u_rows):
        vt = u_rows[:sr.nverts]                                        # (nv, 3)
        et = u_rows[sr.off_e:sr.off_f].reshape(sr.nedges, we)          # (ne, 9)
        ft = u_rows[sr.off_f:sr.off_c].reshape(sr.nfaces, wf)          # (nf, 27)
        vr = jnp.take(vt, vid.reshape(-1), axis=0).reshape(nelem, 24)
        er = jnp.take(et, eid.reshape(-1), axis=0)                     # (e*12, 9)
        fr = jnp.take(ft, fid.reshape(-1), axis=0)                     # (e*6, 27)
        # orientation: select among per-orientation matmuls
        if len(sr.edge_perms) > 1:
            es = e_sig.reshape(-1)
            acc = er @ pe[0]
            for o in range(1, len(sr.edge_perms)):
                acc = jnp.where((es == o)[:, None], er @ pe[o], acc)
            er = acc
        fs = f_sig.reshape(-1)
        acc = fr @ pf[0]
        for o in range(1, len(sr.face_perms)):
            acc = jnp.where((fs == o)[:, None], fr @ pf[o], acc)
        fr = acc
        return jnp.concatenate([
            vr, er.reshape(nelem, 12*we), fr.reshape(nelem, 6*wf),
            u_rows[sr.off_c:].reshape(nelem, s_c*3)], axis=1)

    ref_g = np.asarray(sr.gather_rows(u))
    g3 = np.asarray(gather_v3(u))
    ok = np.allclose(g3, ref_g)
    print("gather_v3 correct:", ok)
    if not ok:
        # локate per class
        print("  verts:", np.allclose(g3[:, :24], ref_g[:, :24]))
        o1, o2 = 24, 24+12*we
        print("  edges:", np.allclose(g3[:, o1:o2], ref_g[:, o1:o2]))
        o3 = o2 + 6*wf
        print("  faces:", np.allclose(g3[:, o2:o3], ref_g[:, o2:o3]))
        print("  inter:", np.allclose(g3[:, o3:], ref_g[:, o3:]))
    dt = chain(gather_v3, (u,))
    print(f"gather_v3:             {dt*1e3:7.2f} ms")

    # ---- scatter v3 ----------------------------------------------------
    # masks instead of sentinel rows: tmap sentinel == nelem*ns (old ext had
    # appended zero row). Use clipped ids + zero masks.
    def prep_tmap(tmap_np, ns):
        sent = nelem * ns
        t = np.asarray(tmap_np)
        mask = (t != sent).astype(np.float32)
        ids = np.where(t == sent, 0, t).astype(np.int32)
        return jnp.asarray(ids), jnp.asarray(mask)
    vt_ids, vt_m = prep_tmap(maps.vert_tmap, 8)
    et_ids, et_m = prep_tmap(maps.edge_tmap, 12)
    ft_ids, ft_m = prep_tmap(maps.face_tmap, 6)

    o1 = 24; o2 = o1 + 12*we; o3 = o2 + 6*wf
    pe_inv = jnp.transpose(pe, (0, 2, 1))
    pf_inv = jnp.transpose(pf, (0, 2, 1))

    def scatter_v3(ve):
        vrow = ve[:, :o1].reshape(nelem*8, 3)
        erow = ve[:, o1:o2].reshape(nelem*12, we)
        frow = ve[:, o2:o3].reshape(nelem*6, wf)
        if len(sr.edge_perms) > 1:
            es = e_sig.reshape(-1)
            acc = erow @ pe_inv[0]
            for o in range(1, len(sr.edge_perms)):
                acc = jnp.where((es == o)[:, None], erow @ pe_inv[o], acc)
            erow = acc
        fs = f_sig.reshape(-1)
        acc = frow @ pf_inv[0]
        for o in range(1, len(sr.face_perms)):
            acc = jnp.where((fs == o)[:, None], frow @ pf_inv[o], acc)
        frow = acc
        def gsum(rows, ids, m, w):
            nent, K = ids.shape
            g = jnp.take(rows, ids.reshape(-1), axis=0).reshape(nent, K, w)
            return (g * m[:, :, None]).sum(axis=1)
        pv = gsum(vrow, vt_ids, vt_m, 3)
        pe_ = gsum(erow, et_ids, et_m, we).reshape(-1, 3)
        pf_ = gsum(frow, ft_ids, ft_m, wf).reshape(-1, 3)
        pi = ve[:, o3:].reshape(-1, 3)
        return jnp.concatenate([pv, pe_, pf_, pi], axis=0)

    ve = jax.random.normal(jax.random.PRNGKey(1), (nelem, sr.P3*3), jnp.float32)
    ref_s = np.asarray(sr.scatter_rows(ve))
    s3 = np.asarray(scatter_v3(ve))
    ok = np.allclose(s3, ref_s, atol=1e-4)
    print("scatter_v3 correct:", ok)
    if not ok:
        print("  verts:", np.allclose(s3[:sr.nverts], ref_s[:sr.nverts], atol=1e-4))
        a, b = sr.off_e, sr.off_f
        print("  edges:", np.allclose(s3[a:b], ref_s[a:b], atol=1e-4))
        b2 = sr.off_c
        print("  faces:", np.allclose(s3[b:b2], ref_s[b:b2], atol=1e-4))
        print("  inter:", np.allclose(s3[b2:], ref_s[b2:], atol=1e-4))
    dt = chain(scatter_v3, (ve,))
    print(f"scatter_v3:            {dt*1e3:7.2f} ms")
    dt = chain(lambda uu: scatter_v3(gather_v3(uu)), (u,))
    print(f"roundtrip_v3:          {dt*1e3:7.2f} ms")

if __name__ == "__main__":
    main()
