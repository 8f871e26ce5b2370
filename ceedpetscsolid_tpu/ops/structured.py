"""Entity-structured restriction + single-GEMM gradient pipeline.

The hot-path alternative to ops/restriction.py + ops/basis.py: instead of a
node-by-node gather into (ncomp, nelem, P3) followed by an einsum over the
basis, the element apply becomes

    gather (entity-row takes)  ->  ONE GEMM (e, P3*3) @ (P3*3, 9*Q3)
      ->  physics on Mat3 views of the GEMM output columns
      ->  ONE GEMM (e, 9*Q3) @ (9*Q3, P3*3)  ->  entity-row scatter-sum

exploiting the entity-class node numbering of mesh/fespace.py
([vertices | edge nodes | face nodes | cell interiors], each entity's nodes
contiguous, interiors element-ordered):

* interior nodes need NO gather at all — a pure reshape of the L-vector;
* edge/face nodes are gathered as whole entity ROWS (one contiguous row of
  (p-1)*3 resp. (p-1)^2*3 values per entity), with the per-element lattice
  ordering restored by a static orientation permutation — orders of
  magnitude fewer gather rows than per-node takes;
* the transpose (owner-sum) is one padded row-take per entity class plus a
  reshape-sum, bitwise deterministic.

This is the CeedElemRestriction + CeedBasis pair (reference
src/setuplibceed.c:194-240, 335-348) re-designed for the TPU memory system:
row-major moves, one MXU contraction per direction set, zero 4D transposes.
Measured ~2.2x faster end-to-end than the generic path on hyperFS degree 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def lattice_class_positions(p: int) -> dict:
    """Flat lattice indices per entity class, in slot-major local order.

    Matches the entity slot conventions of mesh/fespace.py (edge slots
    direction-major, face (u, v) with u fastest).
    """
    P = p + 1
    flat = lambda i, j, k: i + P * (j + P * k)  # noqa: E731
    verts = np.array(
        [flat(p * (v & 1), p * ((v >> 1) & 1), p * ((v >> 2) & 1))
         for v in range(8)]
    )
    if p == 1:
        return dict(verts=verts,
                    edges=np.zeros((12, 0), np.int64),
                    faces=np.zeros((6, 0), np.int64),
                    interior=np.zeros(0, np.int64))
    rng = np.arange(1, p)
    edges = np.zeros((12, p - 1), dtype=np.int64)
    for cj in range(2):
        for ck in range(2):
            edges[cj + 2 * ck] = flat(rng, cj * p, ck * p)
    for ci in range(2):
        for ck in range(2):
            edges[4 + ci + 2 * ck] = flat(ci * p, rng, ck * p)
    for ci in range(2):
        for cj in range(2):
            edges[8 + ci + 2 * cj] = flat(ci * p, cj * p, rng)
    uu = np.tile(rng, p - 1)          # u fastest within a face row
    vv = np.repeat(rng, p - 1)
    faces = np.zeros((6, (p - 1) ** 2), dtype=np.int64)
    faces[0] = flat(0, uu, vv)
    faces[1] = flat(p, uu, vv)
    faces[2] = flat(uu, 0, vv)
    faces[3] = flat(uu, p, vv)
    faces[4] = flat(uu, vv, 0)
    faces[5] = flat(uu, vv, p)
    ii = np.tile(rng, (p - 1) ** 2)
    jj = np.tile(np.repeat(rng, p - 1), p - 1)
    kk = np.repeat(rng, (p - 1) ** 2)
    interior = flat(ii, jj, kk)
    return dict(verts=verts, edges=edges, faces=faces, interior=interior)


def _orientation_sigs(perm: np.ndarray):
    """perm (e, ns, s): local ordering of each entity's canonical row.

    Deduplicates into (unique perms tuple-of-tuples, sig (e, ns) int32)."""
    e, ns, s = perm.shape
    uniq, sig = np.unique(perm.reshape(-1, s), axis=0, return_inverse=True)
    perms = tuple(tuple(int(x) for x in row) for row in uniq)
    return perms, sig.reshape(e, ns).astype(np.int32)


def _transpose_map(ids: np.ndarray, nent: int) -> np.ndarray:
    """ids (e, ns): entity id per element slot. Returns padded (nent, K)
    table of flat e*ns positions contributing to each entity; sentinel =
    e*ns (an appended zero row at apply time)."""
    e, ns = ids.shape
    flat = ids.reshape(-1).astype(np.int64)
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=nent)
    K = int(counts.max(initial=1))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out = np.full((nent, K), e * ns, dtype=np.int32)
    for k in range(K):
        rows = np.nonzero(counts > k)[0]
        out[rows, k] = order[starts[rows] + k]
    return out


class StructuredMaps:
    """Entity-id / orientation tables extracted from an FESpace (setup time,
    numpy). Requires the fespace invariants: per-entity node contiguity and
    element-ordered interiors — guaranteed by mesh/fespace.py numbering."""

    def __init__(self, fes):
        p = fes.degree
        self.p = p
        conn = fes.conn.astype(np.int64)
        nelem = conn.shape[0]
        self.nelem = nelem
        self.num_nodes = fes.num_nodes
        self.off_e, self.off_f, self.off_c = (
            fes.off_edge, fes.off_face, fes.off_cell)
        self.nverts = self.off_e
        pos = lattice_class_positions(p)
        self.P3 = (p + 1) ** 3

        # class-ordered local column order: verts | edges | faces | interior
        self.col_lattice = np.concatenate(
            [pos["verts"], pos["edges"].ravel(), pos["faces"].ravel(),
             pos["interior"]]
        )
        assert np.array_equal(np.sort(self.col_lattice), np.arange(self.P3))

        self.vert_ids = conn[:, pos["verts"]].astype(np.int32)     # (e, 8)
        self.vert_tmap = _transpose_map(self.vert_ids, self.nverts)

        if p > 1:
            s_e = p - 1
            ed = conn[:, pos["edges"].ravel()].reshape(nelem, 12, s_e) - self.off_e
            eids = ed[:, :, 0] // s_e
            assert (ed // s_e == eids[:, :, None]).all(), "edge nodes straddle"
            self.edge_ids = eids.astype(np.int32)                  # (e, 12)
            self.nedges = (self.off_f - self.off_e) // s_e
            self.edge_perms, self.edge_sig = _orientation_sigs(
                ed - eids[:, :, None] * s_e)
            self.edge_tmap = _transpose_map(self.edge_ids, self.nedges)

            s_f = (p - 1) ** 2
            fd = conn[:, pos["faces"].ravel()].reshape(nelem, 6, s_f) - self.off_f
            fids = fd[:, :, 0] // s_f
            assert (fd // s_f == fids[:, :, None]).all(), "face nodes straddle"
            self.face_ids = fids.astype(np.int32)                  # (e, 6)
            self.nfaces = (self.off_c - self.off_f) // s_f
            self.face_perms, self.face_sig = _orientation_sigs(
                fd - fids[:, :, None] * s_f)
            self.face_tmap = _transpose_map(self.face_ids, self.nfaces)

            s_c = (p - 1) ** 3
            want = self.off_c + np.arange(nelem)[:, None] * s_c + np.arange(s_c)
            assert np.array_equal(conn[:, pos["interior"]], want), \
                "interior nodes not element-ordered"


def grad_gemm_matrices_cm(basis, col_lattice: np.ndarray, dtype):
    """Component-BATCHED single-GEMM gradient operator.

    Kg3: (P3, 3*Q3) with columns (d, q); applying to component-major
    E-vectors (3*e, P3) @ Kg3 gives (3*e, 3*Q3) whose (c-block, d-column)
    slices are the nine du[c,d] (e, Q3) planes — 3x fewer MXU flops than
    the interleaved (P3*3, 9*Q3) factorization (no structurally-zero
    rows). Returns (Kg3, Kg3^T)."""
    grad = np.asarray(basis.grad, np.float64)          # (3, Q3, P3) lattice
    Q3, P3 = grad.shape[1], grad.shape[2]
    Kg = np.zeros((P3, 3 * Q3))
    for d in range(3):
        Kg[:, d * Q3:(d + 1) * Q3] = grad[d][:, col_lattice].T
    return jnp.asarray(Kg, dtype), jnp.asarray(np.ascontiguousarray(Kg.T), dtype)


def grad_gemm_matrices(basis, col_lattice: np.ndarray, dtype):
    """Single-GEMM gradient operator in class-column order.

    Kg: (P3*ncomp, 9*Q3) with rows (node p class-ordered, comp c)
    c-fastest and columns ((c*3+d), q) so GEMM-output column slices are
    exactly the nine du[c,d] (e, Q3) planes of a Mat3. Returns (Kg, Kg^T).
    """
    grad = np.asarray(basis.grad, np.float64)          # (3, Q3, P3) lattice
    Q3, P3 = grad.shape[1], grad.shape[2]
    Kg = np.zeros((P3 * 3, 9 * Q3))
    for c in range(3):
        for d in range(3):
            Kg[c::3, (c * 3 + d) * Q3:(c * 3 + d + 1) * Q3] = \
                grad[d][:, col_lattice].T
    return jnp.asarray(Kg, dtype), jnp.asarray(np.ascontiguousarray(Kg.T), dtype)


class StructuredRestriction:
    """Device-side entity-structured gather/scatter (pytree).

    gather_rows: (num_nodes, 3) -> (nelem, P3*3) class-ordered, node-major
      with the 3 components contiguous per node.
    scatter_rows: transpose with owner-sum, (nelem, P3*3) -> (num_nodes, 3).
    """

    def __init__(self, maps: StructuredMaps):
        p = maps.p
        self._init_static(
            p, maps.nelem, maps.num_nodes, maps.nverts,
            maps.off_e, maps.off_f, maps.off_c,
            getattr(maps, "nedges", 0), getattr(maps, "nfaces", 0),
            getattr(maps, "edge_perms", ()), getattr(maps, "face_perms", ()),
        )
        if p == 1:
            self.ids = jnp.asarray(maps.vert_ids)
            self.e_sig = self.f_sig = None
            self.vert_tmap = jnp.asarray(maps.vert_tmap)
            self.edge_tmap = self.face_tmap = None
            return
        # combined entity-row ids: verts, then edges offset by nverts, then
        # faces offset by nverts+nedges (one unified row table at apply time)
        self.ids = jnp.asarray(np.concatenate(
            [maps.vert_ids,
             maps.edge_ids + maps.nverts,
             maps.face_ids + maps.nverts + maps.nedges], axis=1
        ).astype(np.int32))                                        # (e, 26)
        self.e_sig = jnp.asarray(maps.edge_sig)
        self.f_sig = jnp.asarray(maps.face_sig)
        self.vert_tmap = jnp.asarray(maps.vert_tmap)
        self.edge_tmap = jnp.asarray(maps.edge_tmap)
        self.face_tmap = jnp.asarray(maps.face_tmap)

    def _init_static(self, p, nelem, num_nodes, nverts, off_e, off_f, off_c,
                     nedges, nfaces, edge_perms, face_perms):
        self.p = p
        self.nelem = nelem
        self.num_nodes = num_nodes
        self.nverts = nverts
        self.off_e, self.off_f, self.off_c = off_e, off_f, off_c
        self.nedges, self.nfaces = nedges, nfaces
        self.edge_perms = edge_perms        # tuple of tuples (static)
        self.face_perms = face_perms
        s_e, s_f = p - 1, (p - 1) ** 2
        # unified row width, padded to 32 lanes (128 B). A standalone
        # probe (scripts/try_pallas_gather) gathers 32-wide rows at
        # 42.6 GB/s vs ~6 GB/s for this table; in production the padding
        # measured neutral (results/RESTRICTION_PROFILE.json) — the
        # probe/production gap is NOT row width alone and remains the
        # open lead on SURVEY hard-part #1.
        w = max(3, s_e * 3, s_f * 3)
        self.W = -(-w // 32) * 32 if w > 8 else 8
        self.P3 = (p + 1) ** 3

    # -- orientation permutation selection (static perms, tiny count) ----
    @staticmethod
    def _apply_perms(rows, perms, sig, inverse=False):
        """rows (e, ns, s, 3); perms static tuples; sig (e, ns) int."""
        tabs = [np.argsort(pm) if inverse else np.asarray(pm) for pm in perms]
        if len(tabs) == 1:
            pm = tabs[0]
            if np.array_equal(pm, np.arange(len(pm))):
                return rows
            return rows[:, :, jnp.asarray(pm), :]
        out = rows[:, :, jnp.asarray(tabs[0]), :]
        for o in range(1, len(tabs)):
            cand = rows[:, :, jnp.asarray(tabs[o]), :]
            out = jnp.where((sig == o)[:, :, None, None], cand, out)
        return out

    def gather_rows(self, u_rows: jnp.ndarray) -> jnp.ndarray:
        """(num_nodes, 3) -> (nelem, P3*3) class-ordered."""
        p, nelem, W = self.p, self.nelem, self.W
        if p == 1:
            return jnp.take(u_rows, self.ids, axis=0).reshape(nelem, -1)
        s_e, s_f, s_c = p - 1, (p - 1) ** 2, (p - 1) ** 3

        def pad_w(x, w):
            return x if w == W else jnp.pad(x, ((0, 0), (0, W - w)))

        tab = jnp.concatenate([
            pad_w(u_rows[: self.nverts], 3),
            pad_w(u_rows[self.off_e:self.off_f].reshape(self.nedges, s_e * 3),
                  s_e * 3),
            pad_w(u_rows[self.off_f:self.off_c].reshape(self.nfaces, s_f * 3),
                  s_f * 3),
        ], axis=0)
        rows = jnp.take(tab, self.ids, axis=0)         # (e, 26, W)
        vr = rows[:, :8, :3]
        er = rows[:, 8:20, :s_e * 3].reshape(nelem, 12, s_e, 3)
        er = self._apply_perms(er, self.edge_perms, self.e_sig)
        fr = rows[:, 20:, :s_f * 3].reshape(nelem, 6, s_f, 3)
        fr = self._apply_perms(fr, self.face_perms, self.f_sig)
        return jnp.concatenate([
            vr.reshape(nelem, -1),
            er.reshape(nelem, -1),
            fr.reshape(nelem, -1),
            u_rows[self.off_c:].reshape(nelem, s_c * 3),
        ], axis=1)

    @staticmethod
    def _gather_sum(rows_flat, tmap, width):
        """One padded take + reshape-sum; tmap (nent, K), sentinel = nrows.

        Rows are padded to 32 lanes before the take (same ~6x row-gather
        alignment effect as in gather_rows)."""
        nent, K = tmap.shape
        wp = -(-width // 32) * 32 if width > 8 else 8
        if wp != width:
            rows_flat = jnp.pad(rows_flat, ((0, 0), (0, wp - width)))
        ext = jnp.concatenate(
            [rows_flat, jnp.zeros((1, wp), rows_flat.dtype)], axis=0)
        g = jnp.take(ext, tmap.reshape(-1), axis=0)
        return g.reshape(nent, K, wp).sum(axis=1)[:, :width]

    def scatter_rows(self, ve: jnp.ndarray) -> jnp.ndarray:
        """(nelem, P3*3) class-ordered -> (num_nodes, 3) owner-summed."""
        p, nelem = self.p, self.nelem
        s_e, s_f = p - 1, (p - 1) ** 2
        o1 = 8 * 3
        if p == 1:
            return self._gather_sum(ve.reshape(nelem * 8, 3),
                                    self.vert_tmap, 3)
        o2 = o1 + 12 * s_e * 3
        o3 = o2 + 6 * s_f * 3
        parts = [self._gather_sum(ve[:, :o1].reshape(nelem * 8, 3),
                                  self.vert_tmap, 3)]
        er = ve[:, o1:o2].reshape(nelem, 12, s_e, 3)
        er = self._apply_perms(er, self.edge_perms, self.e_sig, inverse=True)
        parts.append(self._gather_sum(
            er.reshape(nelem * 12, s_e * 3), self.edge_tmap, s_e * 3
        ).reshape(-1, 3))
        fr = ve[:, o2:o3].reshape(nelem, 6, s_f, 3)
        fr = self._apply_perms(fr, self.face_perms, self.f_sig, inverse=True)
        parts.append(self._gather_sum(
            fr.reshape(nelem * 6, s_f * 3), self.face_tmap, s_f * 3
        ).reshape(-1, 3))
        parts.append(ve[:, o3:].reshape(-1, 3))
        return jnp.concatenate(parts, axis=0)

    # -- pytree protocol (index tables travel as jit args) ----------------
    def tree_flatten(self):
        children = (self.ids, self.e_sig, self.f_sig, self.vert_tmap,
                    self.edge_tmap, self.face_tmap)
        aux = (self.p, self.nelem, self.num_nodes, self.nverts,
               self.off_e, self.off_f, self.off_c, self.nedges, self.nfaces,
               self.edge_perms, self.face_perms)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._init_static(*aux)
        (obj.ids, obj.e_sig, obj.f_sig, obj.vert_tmap,
         obj.edge_tmap, obj.face_tmap) = children
        return obj


jax.tree_util.register_pytree_node(
    StructuredRestriction,
    lambda r: r.tree_flatten(),
    StructuredRestriction.tree_unflatten,
)
