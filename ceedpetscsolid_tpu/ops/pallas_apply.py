"""Fused Pallas TPU kernel for the element apply pipeline.

One kernel per operator application executes, entirely in VMEM per element
block, the B -> D -> B^T core of the CeedOperator decomposition (reference
src/setuplibceed.c:529-542) with NO HBM round-trips for the (e, 9*Q3)
gradient/stress intermediates:

    u_c  = rows @ S_c            component de-interleave   (MXU, exact)
    du_c = u_c @ Gcat            3 concatenated-direction GEMMs
      ->  physics planes (Mat3 over (BE, Q3p) views of du_c columns)
    v_c  = [dv_c0|dv_c1|dv_c2] @ Gcat^T
    rows_out += v_c @ S_c^T      re-interleave + accumulate (MXU, exact)

The kernel consumes the StructuredRestriction row layout (e, P3*3)
DIRECTLY: the component de-interleave that round 4 did as an XLA transpose
outside the kernel (minor-dim-3 transposes, ~20 ms/apply on the 8.9M-DoF
cylinder — the dominant cost of the fused path) is two 0/1 selection GEMMs
in VMEM (~0.6 ms of MXU work per apply). Selection matrices are exact 0/1,
and the TPU f32 3-pass matmul reconstructs selected values exactly.

The displacement components are a BATCH dimension of the gradient GEMMs
rather than interleaved into the contraction (as the 9-plane (P3*3, Q3)
factorization would do) — 3x fewer MXU flops, no structurally-zero rows;
the three direction blocks are CONCATENATED into one (P3p, 3*Q3p) operand
so each component needs one forward and one adjoint MXU dispatch.

Layout rules (see /opt/skills/guides/pallas_guide.md):
  * every (elem, Q3) physics plane is padded to Q3p = ceil(Q3/128)*128 lanes
    so plane slices are lane-aligned; the padded gradient matrices have zero
    columns there and padded qdata carries (wdetJ=0, dXdx=I), so padded
    lanes compute finite garbage that is weighted to exactly zero;
  * row columns are padded to P3r = ceil(P3*3/128)*128: padded S rows are
    zero so padded columns contribute nothing and stay zero on output;
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


def padded_grad_matrices(basis, col_lattice: np.ndarray, dtype):
    """Operand bundle (Gcat, GcatT, S, ST) for the rows-layout kernel.

    Gcat (P3p, 3*Q3p): direction-d gradient in the given column order at
    column block d (zero-padded rows/lanes). S (3, P3r, P3p): exact 0/1
    de-interleave matrices mapping node-major comp-fastest row columns
    (node n, comp c) -> per-component node columns. ST = S^T per comp.
    """
    grad = np.asarray(basis.grad, np.float64)           # (3, Q3, P3) lattice
    Q3, P3 = grad.shape[1], grad.shape[2]
    Q3p = _round_up(Q3, 128)
    P3p = _round_up(P3, 128)
    P3r = _round_up(P3 * 3, 128)
    G = np.zeros((P3p, 3 * Q3p))
    for d in range(3):
        G[:P3, d * Q3p:d * Q3p + Q3] = grad[d][:, col_lattice].T
    S = np.zeros((3, P3r, P3p), np.float64)
    for c in range(3):
        S[c, np.arange(P3) * 3 + c, np.arange(P3)] = 1.0
    GT = np.ascontiguousarray(G.T)
    ST = np.ascontiguousarray(np.transpose(S, (0, 2, 1)))
    return (jnp.asarray(G, dtype), jnp.asarray(GT, dtype),
            jnp.asarray(S, dtype), jnp.asarray(ST, dtype))


def pad_rows(rows: jnp.ndarray, e_pad: int, P3r: int) -> jnp.ndarray:
    """(nelem, P3*3) -> (e_pad, P3r) zero-padded."""
    nelem, w = rows.shape
    return jnp.pad(rows, ((0, e_pad - nelem), (0, P3r - w)))


def pad_qdata(qdata, nelem_pad: int) -> jnp.ndarray:
    """(10, nelem, Q3) -> (10, nelem_pad, Q3p) with IDENTITY geometry and
    zero weight in all padding, so physics kernels stay finite there."""
    ten, nelem, Q3 = qdata.shape
    Q3p = _round_up(Q3, 128)
    eye = np.zeros((10, 1, 1), qdata.dtype)
    eye[[1, 5, 9]] = 1.0                                 # dXdx = I, wdetJ = 0
    out = jnp.broadcast_to(jnp.asarray(eye), (10, nelem_pad, Q3p))
    return out.at[:, :nelem, :Q3].set(qdata)


def _apply_kernel(*refs, planes_fn, phys, jacobian, stash_in, stash_out,
                  Q3p):
    """Shared kernel body.

    Ref order (Pallas: all inputs, then all outputs):
      rows, qdata, Gcat, GcatT, S, ST, [stash_in], out, [stash_out]
    """
    f32 = jnp.float32
    rows_ref, qd_ref, g_ref, gt_ref, s_ref, st_ref = refs[:6]
    rest = refs[6:]
    if stash_in:
        sref, rest = rest[0], rest[1:]
    out_ref = rest[0]
    rows = rows_ref[...]
    du_c = []
    for c in range(3):
        uc = jnp.dot(rows, s_ref[c], preferred_element_type=f32)
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
    acc = None
    for c in range(3):
        dvc = jnp.concatenate(dv.m[3 * c:3 * c + 3], axis=1)
        vc = jnp.dot(dvc, gt_ref[...], preferred_element_type=f32)
        term = jnp.dot(vc, st_ref[c], preferred_element_type=f32)
        acc = term if acc is None else acc + term
    out_ref[...] = acc
    if stash_out:
        sout = rest[1]
        for k in range(9):
            sout[k] = new_stash.m[k]


def make_fused_apply(planes_fn, phys, P3: int, Q3: int, nelem: int,
                     dtype, *, jacobian: bool = False, stash_in: bool = False,
                     stash_out: bool = False, block_elems: int = 128,
                     interpret: bool = False):
    """Build `fn(rows_pad, qdata_pad, mats[, stash]) -> (ve_rows[, stash])`.

    rows_pad (e_pad, P3r) from `pad_rows`; qdata_pad (10, e_pad, Q3p);
    stash (9, e_pad, Q3p); mats the `padded_grad_matrices` bundle.
    """
    assert dtype == jnp.float32, "pallas apply path is f32-only"
    Q3p = _round_up(Q3, 128)
    P3p = _round_up(P3, 128)
    P3r = _round_up(P3 * 3, 128)
    BE = block_elems
    e_pad = _round_up(max(nelem, BE), BE)
    grid = (e_pad // BE,)

    kernel = functools.partial(
        _apply_kernel, planes_fn=planes_fn, phys=phys,
        jacobian=jacobian, stash_in=stash_in, stash_out=stash_out, Q3p=Q3p,
    )

    rows_spec = pl.BlockSpec((BE, P3r), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    qd_spec = pl.BlockSpec((10, BE, Q3p), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    stash_spec = pl.BlockSpec((9, BE, Q3p), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    in_specs = [rows_spec, qd_spec, full((P3p, 3 * Q3p)),
                full((3 * Q3p, P3p)), full((3, P3r, P3p)),
                full((3, P3p, P3r))]
    if stash_in:
        in_specs.append(stash_spec)
    out_shape = [jax.ShapeDtypeStruct((e_pad, P3r), dtype)]
    out_specs = [rows_spec]
    if stash_out:
        out_shape.append(jax.ShapeDtypeStruct((9, e_pad, Q3p), dtype))
        out_specs.append(stash_spec)

    # rough cost: de-interleave + 2 GEMM sets + physics (helps the
    # scheduler overlap DMA)
    flops = 2 * e_pad * (2 * 3 * (P3r * P3p + P3p * 3 * Q3p))
    nbytes = 4 * (2 * e_pad * P3r + 10 * e_pad * Q3p
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

    def fn(rows_pad, qdata_pad, mats, stash=None):
        args = (rows_pad, qdata_pad) + tuple(mats)
        if stash_in:
            args = args + (stash,)
        return call(*args)

    fn.e_pad = e_pad
    fn.Q3p = Q3p
    fn.P3p = P3p
    fn.P3r = P3r
    return fn


def stash_view(stash, nelem: int, Q3: int):
    """Pallas stash (9, e_pad, Q3p) -> Mat3 of (nelem, Q3) views; Mat3
    passes through unchanged (XLA structured path)."""
    if isinstance(stash, Mat3) or stash is None:
        return stash
    return Mat3([stash[k, :nelem, :Q3] for k in range(9)])
