"""Fused Pallas TPU kernel for the element apply pipeline.

One kernel per operator application executes, entirely in VMEM per element
block, the B -> D -> B^T core of the CeedOperator decomposition (reference
src/setuplibceed.c:529-542) with NO HBM round-trips for the (e, 9*Q3)
gradient/stress intermediates — and with the element restriction's
ORIENTATION PERMUTATIONS and COMPONENT DE-INTERLEAVE folded into its MXU
contractions:

    X = [ vr | er*m_e0 | er*m_e1 | fr*m_f0 .. fr*m_f7 | ir ]   (VPU masks)
    u_c  = X @ M_c          one stacked selection GEMM per component
    du_c = u_c @ Gcat       3 concatenated-direction GEMMs
      ->  physics planes (Mat3 over (BE, Q3p) views of du_c columns)
    Y   += [dv_c0|dv_c1|dv_c2] @ Gcat^T @ M_c^T
    er_out = sum_o m_eo * Y[:, eo block]  (etc.)               (VPU masks)

The kernel consumes the per-entity-class gather outputs DIRECTLY — vr
(e, 24), er (e, 12*(p-1)*3) and fr (e, 6*(p-1)^2*3) rows in CANONICAL
entity order straight from the class takes, ir a reshape view of the
L-vector — and emits canonical-order class rows the scatter sums without
any reordering. Round-5 profiling on the 8.9M-DoF cylinder showed the
XLA-level alternatives dominating the apply: runtime permutation
select-chains + 0/1-matrix GEMMs ~14 ms, E-row concat/pad/slice copies
~10 ms, while this kernel's own runtime is ~2 ms. A slot's masked copies
appear once per distinct orientation in the stacked operand; with M_c
pre-multiplied by that orientation's permutation (exact 0/1 matrices,
reconstructed exactly by the f32 3-pass MXU), zeroed blocks contribute
nothing and the permutation costs only the extra stacked-GEMM depth
(~2 ms of MXU work vs ~14 ms of XLA data formatting).

Layout rules (see /opt/skills/guides/pallas_guide.md):
  * every (elem, Q3) physics plane is padded to Q3p = ceil(Q3/128)*128 lanes
    so plane slices are lane-aligned; the padded gradient matrices have zero
    columns there and padded qdata carries (wdetJ=0, dXdx=I), so padded
    lanes compute finite garbage that is weighted to exactly zero;
  * elements are padded to a multiple of the block size BE; padded rows are
    zero inputs against identity geometry -> zero outputs, sliced off after.

The nonlinear stash (gradu, hyperFS.h:157) is written/read as a single
(9, e_pad, Q3p) array; `stash_view` re-exposes it as Mat3 of (nelem, Q3)
views for the unstructured consumers (diagonal assembly, p=1 element
matrices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import Mat3


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ClassSpec:
    """Static layout of the stacked kernel operand for one mesh family.

    widths:  (wv, we, wf, wi) input row widths per class — any may be 0;
             a LATTICE mesh uses (0, 0, 0, P3*3) (single unpermuted block).
    perms:   (edge_perms, face_perms) tuples of node-permutation tuples
             (canonical -> local), empty when the class is absent.
    """

    def __init__(self, p: int, edge_perms=(), face_perms=(), lattice=False):
        P3 = (p + 1) ** 3
        if lattice or p == 1:
            if lattice:
                self.widths = (0, 0, 0, P3 * 3)
            else:
                self.widths = (24, 0, 0, (p - 1) ** 3 * 3)
            self.edge_perms = ()
            self.face_perms = ()
        else:
            s_e, s_f = p - 1, (p - 1) ** 2
            self.widths = (24, 12 * s_e * 3, 6 * s_f * 3, (p - 1) ** 3 * 3)
            self.edge_perms = tuple(tuple(pm) for pm in edge_perms)
            self.face_perms = tuple(tuple(pm) for pm in face_perms)
        wv, we, wf, wi = self.widths
        self.n_e = max(1, len(self.edge_perms)) if we else 0
        self.n_f = max(1, len(self.face_perms)) if wf else 0
        # stacked operand column blocks: [vr | er x n_e | fr x n_f | ir]
        self.off_e = wv
        self.off_f = wv + self.n_e * we
        self.off_i = self.off_f + self.n_f * wf
        self.K = self.off_i + wi
        self.Kp = _round_up(max(self.K, 128), 128)

    def key(self):
        return (self.widths, self.edge_perms, self.face_perms)


def stacked_matrices(basis, col_lattice: np.ndarray, spec: ClassSpec, dtype):
    """Operand bundle (Gcat, GcatT, M (3, Kp, P3p), MT (3, P3p, Kp)).

    M_c maps the stacked masked operand X to the component-c nodal vector
    in class-column order. X's layout contract (see
    StructuredRestriction.gather_cls_cm): vert rows interleave components
    per vertex; edge/face/interior rows are COMPONENT-BLOCKED
    ([u0(nodes) | u1 | u2], nodes in CANONICAL entity order), and each
    edge/face orientation o gets its own masked block with o's
    canonical->local node permutation folded in here. Exact 0/1 entries —
    the TPU f32 3-pass matmul reconstructs selected values exactly.
    """
    grad = np.asarray(basis.grad, np.float64)           # (3, Q3, P3) lattice
    Q3, P3 = grad.shape[1], grad.shape[2]
    Q3p = _round_up(Q3, 128)
    P3p = _round_up(P3, 128)
    G = np.zeros((P3p, 3 * Q3p))
    for d in range(3):
        G[:P3, d * Q3p:d * Q3p + Q3] = grad[d][:, col_lattice].T

    wv, we, wf, wi = spec.widths
    nv = wv // 3
    s_e = we // 36 if we else 0          # nodes per edge
    s_f = wf // 18 if wf else 0          # nodes per face
    s_c = wi // 3 if wi else 0
    M = np.zeros((3, spec.Kp, P3p))
    for c in range(3):
        row = 0
        for v in range(nv):              # verts: interleaved per vertex
            M[c, row + v * 3 + c, v] = 1.0
        row += wv
        for o in range(spec.n_e):        # edges: blocked, perm folded
            pm = (spec.edge_perms[o] if spec.edge_perms
                  else tuple(range(s_e)))
            for slot in range(12):
                for i in range(s_e):     # local node i <- canonical pm[i]
                    node = nv + slot * s_e + i
                    M[c, row + slot * 3 * s_e + c * s_e + pm[i], node] = 1.0
            row += we
        for o in range(spec.n_f):        # faces: blocked, perm folded
            pm = (spec.face_perms[o] if spec.face_perms
                  else tuple(range(s_f)))
            base = nv + 12 * s_e
            for slot in range(6):
                for i in range(s_f):
                    node = base + slot * s_f + i
                    M[c, row + slot * 3 * s_f + c * s_f + pm[i], node] = 1.0
            row += wf
        base = nv + 12 * s_e + 6 * s_f   # interior (or ALL nodes, lattice)
        for j in range(s_c):
            M[c, row + c * s_c + j, base + j] = 1.0
    GT = np.ascontiguousarray(G.T)
    MT = np.ascontiguousarray(np.transpose(M, (0, 2, 1)))
    return (jnp.asarray(G, dtype), jnp.asarray(GT, dtype),
            jnp.asarray(M, dtype), jnp.asarray(MT, dtype))


# alias kept for the factory call sites
def padded_grad_matrices(basis, col_lattice, spec: ClassSpec, dtype):
    return stacked_matrices(basis, col_lattice, spec, dtype)


def pad_qdata(qdata, nelem_pad: int) -> jnp.ndarray:
    """(10, nelem, Q3) -> (10, nelem_pad, Q3p) with IDENTITY geometry and
    zero weight in all padding, so physics kernels stay finite there."""
    ten, nelem, Q3 = qdata.shape
    Q3p = _round_up(Q3, 128)
    eye = np.zeros((10, 1, 1), qdata.dtype)
    eye[[1, 5, 9]] = 1.0                                 # dXdx = I, wdetJ = 0
    out = jnp.broadcast_to(jnp.asarray(eye), (10, nelem_pad, Q3p))
    return out.at[:, :nelem, :Q3].set(qdata)


def _apply_kernel(*refs, planes_fn, phys, spec, jacobian, stash_in,
                  stash_out, Q3p, names_in, names_out):
    """Shared kernel body. Ref order: class/sig inputs (per names_in),
    qdata, Gcat, GcatT, M, MT, [stash_in], class outputs (per names_out),
    [stash_out]."""
    f32 = jnp.float32
    nin = len(names_in)
    cls_refs = dict(zip(names_in, refs[:nin]))
    qd_ref, g_ref, gt_ref, m_ref, mt_ref = refs[nin:nin + 5]
    rest = refs[nin + 5:]
    if stash_in:
        sref, rest = rest[0], rest[1:]
    out_refs = dict(zip(names_out, rest[:len(names_out)]))
    srest = rest[len(names_out):]
    BE = qd_ref.shape[1]
    wv, we, wf, wi = spec.widths

    # ---- stack the masked operand X (BE, Kp) ------------------------
    parts = []
    e_masks, f_masks = [], []
    if wv:
        parts.append(cls_refs["vr"][...])
    if we:
        er = cls_refs["er"][...]
        if spec.n_e > 1:
            es = cls_refs["es"][...]
            for o in range(spec.n_e):
                m = (es == o).astype(f32)
                e_masks.append(m)
                parts.append(er * m)
        else:
            parts.append(er)
    if wf:
        fr = cls_refs["fr"][...]
        if spec.n_f > 1:
            fs = cls_refs["fs"][...]
            for o in range(spec.n_f):
                m = (fs == o).astype(f32)
                f_masks.append(m)
                parts.append(fr * m)
        else:
            parts.append(fr)
    if wi:
        parts.append(cls_refs["ir"][...])
    if spec.Kp > spec.K:
        parts.append(jnp.zeros((BE, spec.Kp - spec.K), f32))
    X = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    du_c = []
    for c in range(3):
        uc = jnp.dot(X, m_ref[c], preferred_element_type=f32)
        du_c.append(jnp.dot(uc, g_ref[...], preferred_element_type=f32))
    du = Mat3([du_c[c][:, d * Q3p:(d + 1) * Q3p]
               for c in range(3) for d in range(3)])
    qd = qd_ref[...]
    if jacobian:
        stash = Mat3([sref[k] for k in range(9)]) if stash_in else None
        dv = planes_fn(du, qd, stash, phys)
        new_stash = None
    else:
        dv, new_stash = planes_fn(du, qd, phys)
    Y = None
    for c in range(3):
        dvc = jnp.concatenate(dv.m[3 * c:3 * c + 3], axis=1)
        vc = jnp.dot(dvc, gt_ref[...], preferred_element_type=f32)
        term = jnp.dot(vc, mt_ref[c], preferred_element_type=f32)
        Y = term if Y is None else Y + term

    # ---- unstack the adjoint back to canonical class rows -----------
    row = 0
    if wv:
        out_refs["vr"][...] = Y[:, 0:wv]
        row += wv
    if we:
        if spec.n_e > 1:
            acc = Y[:, row:row + we] * e_masks[0]
            row += we
            for o in range(1, spec.n_e):
                acc = acc + Y[:, row:row + we] * e_masks[o]
                row += we
        else:
            acc = Y[:, row:row + we]
            row += we
        out_refs["er"][...] = acc
    if wf:
        if spec.n_f > 1:
            acc = Y[:, row:row + wf] * f_masks[0]
            row += wf
            for o in range(1, spec.n_f):
                acc = acc + Y[:, row:row + wf] * f_masks[o]
                row += wf
        else:
            acc = Y[:, row:row + wf]
            row += wf
        out_refs["fr"][...] = acc
    if wi:
        out_refs["ir"][...] = Y[:, row:row + wi]
    if stash_out:
        for k in range(9):
            srest[0][k] = new_stash.m[k]


def make_fused_apply(planes_fn, phys, P3: int, Q3: int, nelem: int,
                     dtype, spec: ClassSpec, *, jacobian: bool = False,
                     stash_in: bool = False, stash_out: bool = False,
                     block_elems: int = 128, interpret: bool = False):
    """Build `fn(cls, qdata_pad, mats[, stash]) -> (cls_out[, stash])`.

    cls: dict with the present keys among vr (e_pad, 24), er/fr canonical
    class rows, ir interior rows, es/fs int32 per-COLUMN orientation sigs
    (only when >1 orientation exists). qdata_pad (10, e_pad, Q3p); stash
    (9, e_pad, Q3p); mats the `stacked_matrices` bundle. Outputs mirror
    the vr/er/fr/ir keys.
    """
    assert dtype == jnp.float32, "pallas apply path is f32-only"
    Q3p = _round_up(Q3, 128)
    P3p = _round_up(P3, 128)
    BE = block_elems
    # always >= one pad element: pad rows emit exact zeros, which the
    # class scatter uses as its sentinel target (see OperatorFactory)
    e_pad = _round_up(nelem + 1, BE)
    grid = (e_pad // BE,)
    wv, we, wf, wi = spec.widths

    names_in = []
    widths_in = []
    for nm, w in (("vr", wv), ("er", we), ("fr", wf), ("ir", wi)):
        if w:
            names_in.append(nm)
            widths_in.append(w)
    if we and spec.n_e > 1:
        names_in.append("es")
        widths_in.append(we)
    if wf and spec.n_f > 1:
        names_in.append("fs")
        widths_in.append(wf)
    names_out = [nm for nm, w in
                 (("vr", wv), ("er", we), ("fr", wf), ("ir", wi)) if w]

    kernel = functools.partial(
        _apply_kernel, planes_fn=planes_fn, phys=phys, spec=spec,
        jacobian=jacobian, stash_in=stash_in, stash_out=stash_out,
        Q3p=Q3p, names_in=names_in, names_out=names_out,
    )

    def rows_spec(w):
        return pl.BlockSpec((BE, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    qd_spec = pl.BlockSpec((10, BE, Q3p), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    stash_spec = pl.BlockSpec((9, BE, Q3p), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    in_specs = [rows_spec(w) for w in widths_in]
    in_specs += [qd_spec, full((P3p, 3 * Q3p)), full((3 * Q3p, P3p)),
                 full((3, spec.Kp, P3p)), full((3, P3p, spec.Kp))]
    if stash_in:
        in_specs.append(stash_spec)
    out_shape = [jax.ShapeDtypeStruct((e_pad, w), dtype)
                 for nm, w in (("vr", wv), ("er", we), ("fr", wf),
                               ("ir", wi)) if w]
    out_specs = [rows_spec(w) for nm, w in
                 (("vr", wv), ("er", we), ("fr", wf), ("ir", wi)) if w]
    if stash_out:
        out_shape.append(jax.ShapeDtypeStruct((9, e_pad, Q3p), dtype))
        out_specs.append(stash_spec)

    flops = 2 * e_pad * (2 * 3 * (spec.Kp * P3p + P3p * 3 * Q3p))
    nbytes = 4 * (2 * e_pad * sum(spec.widths) + 10 * e_pad * Q3p
                  + (9 * e_pad * Q3p) * (stash_in + stash_out))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nbytes,
            transcendentals=e_pad * Q3p * 4,
        ),
        interpret=interpret,
    )

    def fn(cls, qdata_pad, mats, stash=None):
        G, GT, M, MT = mats[:4]
        cls = dict(cls)
        if "es" in names_in and "es" not in cls:
            cls["es"] = mats[4]
        if "fs" in names_in and "fs" not in cls:
            cls["fs"] = mats[5]
        args = tuple(cls[nm] for nm in names_in) + (qdata_pad, G, GT, M, MT)
        if stash_in:
            args = args + (stash,)
        out = call(*args)
        if not isinstance(out, (list, tuple)):
            out = [out]
        res = dict(zip(names_out, out))
        if stash_out:
            return res, out[len(names_out)]
        return res

    fn.e_pad = e_pad
    fn.Q3p = Q3p
    fn.P3p = P3p
    fn.names_in = tuple(names_in)
    fn.names_out = tuple(names_out)
    return fn


def stash_view(stash, nelem: int, Q3: int):
    """Pallas stash (9, e_pad, Q3p) -> Mat3 of (nelem, Q3) views; Mat3
    passes through unchanged (XLA structured path)."""
    if isinstance(stash, Mat3) or stash is None:
        return stash
    return Mat3([stash[k, :nelem, :Q3] for k in range(9)])
