"""Stage-by-stage honest timing of the production restriction internals on
the flagship cylinder mesh: take/tab/perms/concat each in isolation with
REAL index distributions (synthetic uniform ids measured 8.3 ms for the
same take that production pays ~20 for — find the divergence)."""
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
    from ceedpetscsolid_tpu.ops.structured import StructuredMaps, StructuredRestriction

    mesh = reorder_mesh(read_exodus(MESH))
    fes = build_fespace(mesh, 4)
    maps = StructuredMaps(fes)
    sr = StructuredRestriction(maps)
    p, W, nelem = sr.p, sr.W, sr.nelem
    s_e, s_f, s_c = p-1, (p-1)**2, (p-1)**3
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (maps.num_nodes, 3), jnp.float32)

    def build_tab(u_rows):
        def pad_w(x, w):
            return x if w == W else jnp.pad(x, ((0,0),(0,W-w)))
        return jnp.concatenate([
            pad_w(u_rows[:sr.nverts], 3),
            pad_w(u_rows[sr.off_e:sr.off_f].reshape(sr.nedges, s_e*3), s_e*3),
            pad_w(u_rows[sr.off_f:sr.off_c].reshape(sr.nfaces, s_f*3), s_f*3),
        ], axis=0)

    dt = chain(build_tab, (u,))
    print(f"tab build alone:        {dt*1e3:7.2f} ms")

    tab = build_tab(u)               # prebuilt, passed as arg
    ids1 = sr.ids.reshape(-1)
    dt = chain(lambda t, ix: jnp.take(t, ix, axis=0), (tab, ids1))
    print(f"take alone (real ids):  {dt*1e3:7.2f} ms   [{ids1.size} rows]")
    ids_rand = jax.random.randint(key, (ids1.size,), 0, tab.shape[0], jnp.int32)
    dt = chain(lambda t, ix: jnp.take(t, ix, axis=0), (tab, ids_rand))
    print(f"take alone (rand ids):  {dt*1e3:7.2f} ms")

    rows = jnp.take(tab, ids1, axis=0).reshape(nelem, 26, W)
    def perms_only(rows):
        er = rows[:, 8:20, :s_e*3].reshape(nelem, 12, s_e, 3)
        er = sr._apply_perms(er, sr.edge_perms, sr.e_sig)
        fr = rows[:, 20:, :s_f*3].reshape(nelem, 6, s_f, 3)
        fr = sr._apply_perms(fr, sr.face_perms, sr.f_sig)
        return er, fr
    dt = chain(perms_only, (rows,))
    print(f"perms alone (e+f):      {dt*1e3:7.2f} ms")

    def concat_only(rows, u_rows):
        vr = rows[:, :8, :3]
        er = rows[:, 8:20, :s_e*3]
        fr = rows[:, 20:, :s_f*3]
        return jnp.concatenate([
            vr.reshape(nelem, -1), er.reshape(nelem, -1),
            fr.reshape(nelem, -1),
            u_rows[sr.off_c:].reshape(nelem, s_c*3)], axis=1)
    dt = chain(concat_only, (rows, u))
    print(f"concat alone (no perm): {dt*1e3:7.2f} ms")

    # scatter stages
    ve = jax.random.normal(jax.random.PRNGKey(1), (nelem, sr.P3*3), jnp.float32)
    o1 = 8*3; o2 = o1 + 12*s_e*3; o3 = o2 + 6*s_f*3

    def inv_perms_only(ve):
        er = ve[:, o1:o2].reshape(nelem, 12, s_e, 3)
        er = sr._apply_perms(er, sr.edge_perms, sr.e_sig, inverse=True)
        fr = ve[:, o2:o3].reshape(nelem, 6, s_f, 3)
        fr = sr._apply_perms(fr, sr.face_perms, sr.f_sig, inverse=True)
        return er, fr
    dt = chain(inv_perms_only, (ve,))
    print(f"inv perms alone:        {dt*1e3:7.2f} ms")

    # per-class gather-sum takes with prebuilt ext tables (barrier'd)
    for name, tmap, ns, w in (("vert", sr.vert_tmap, 8, 3),
                              ("edge", sr.edge_tmap, 12, s_e*3),
                              ("face", sr.face_tmap, 6, s_f*3)):
        nent, K = tmap.shape
        wp = -(-w // 32) * 32 if w > 8 else 8
        rows_flat = jax.random.normal(key, (nelem*ns + 1, wp), jnp.float32)
        def gsum(rf, tm):
            g = jnp.take(rf, tm.reshape(-1), axis=0)
            return g.reshape(nent, K, wp).sum(axis=1)[:, :w]
        dt = chain(gsum, (rows_flat, tmap))
        print(f"gsum {name} ({nent}x{K},w{wp}): {dt*1e3:7.2f} ms  [{nent*K} rows]")
        def take_only(rf, tm):
            return jnp.take(rf, tm.reshape(-1), axis=0)
        dt = chain(take_only, (rows_flat, tmap))
        print(f"  take only:            {dt*1e3:7.2f} ms")

if __name__ == "__main__":
    main()
