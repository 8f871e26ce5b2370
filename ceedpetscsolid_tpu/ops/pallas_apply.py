"""Fused Pallas TPU kernel for the element apply pipeline.

One kernel per operator application executes, entirely in VMEM per element
block, with COMPONENT-BLOCKED operands:

    du[c,d] = u_c @ G[d]     9 GEMMs (BE, P3p) x (P3p, Q3p)
      ->  physics planes (Mat3 over (BE, Q3p))
    v_c = sum_d dv[c,d] @ G[d]^T   9 GEMMs accumulated per component

i.e. the B -> D -> B^T core of the CeedOperator decomposition (reference
src/setuplibceed.c:529-542) with NO HBM round-trips for the (e, 9*Q3)
gradient/stress intermediates. On the tunneled v5-lite chip the XLA
(unfused) structured pipeline is HBM-bandwidth-bound on exactly those
intermediates (~36 MB/apply saved). The displacement components are a
BATCH dimension of the GEMMs rather than interleaved into the contraction
(as the 9-plane (P3*3, Q3) factorization would do) — 3x fewer MXU flops,
no structurally-zero rows.

Layout rules (see /opt/skills/guides/pallas_guide.md):
  * every (elem, Q3) physics plane is padded to Q3p = ceil(Q3/128)*128 lanes
    so plane slices are lane-aligned; the padded gradient matrices have zero
    columns there and padded qdata carries (wdetJ=0, dXdx=I), so padded
    lanes compute finite garbage that is weighted to exactly zero;
  * nodal rows are padded to P3p = ceil(P3/128)*128: padded G rows are zero
    so padded ue columns contribute nothing; padded output columns are zero
    because G^T's corresponding columns are zero;
  * elements are padded to a multiple of the block size BE; padded rows are
    zero inputs against identity geometry -> zero outputs, sliced off after.

`pack_rows`/`unpack_rows` convert between the StructuredRestriction row
layout (nelem, P3*3) (component-fastest, class-column order) and the kernel
layout (3, e_pad, P3p); the transposes live OUTSIDE the kernel where XLA
fuses them with the gather/scatter.

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
    """Component-blocked gradient operators (G (3, P3p, Q3p), GT (3, Q3p, P3p)).

    G[d, :P3, :Q3] is the direction-d gradient matrix in the given column
    order; rows/lanes are 128-padded with zeros. The displacement components
    are a BATCH dimension of the GEMM (du[c,d] = u_c @ G[d]) rather than
    being interleaved into the contraction — this is 3x fewer MXU flops
    than the 9-plane interleaved factorization (no structurally-zero rows).
    """
    grad = np.asarray(basis.grad, np.float64)           # (3, Q3, P3) lattice
    Q3, P3 = grad.shape[1], grad.shape[2]
    Q3p = _round_up(Q3, 128)
    P3p = _round_up(P3, 128)
    G = np.zeros((3, P3p, Q3p))
    for d in range(3):
        G[d, :P3, :Q3] = grad[d][:, col_lattice].T
    GT = np.ascontiguousarray(np.transpose(G, (0, 2, 1)))
    return jnp.asarray(G, dtype), jnp.asarray(GT, dtype)


def pack_rows(rows: jnp.ndarray, e_pad: int, P3p: int) -> jnp.ndarray:
    """(nelem, P3*3) component-fastest rows -> (3, e_pad, P3p) blocked."""
    nelem, w = rows.shape
    P3 = w // 3
    x = rows.reshape(nelem, P3, 3).transpose(2, 0, 1)
    return jnp.pad(x, ((0, 0), (0, e_pad - nelem), (0, P3p - P3)))


def unpack_rows(out: jnp.ndarray, nelem: int, P3: int) -> jnp.ndarray:
    """(3, e_pad, P3p) blocked -> (nelem, P3*3) component-fastest rows."""
    return out[:, :nelem, :P3].transpose(1, 2, 0).reshape(nelem, P3 * 3)


def pad_qdata(qdata, nelem_pad: int) -> jnp.ndarray:
    """(10, nelem, Q3) -> (10, nelem_pad, Q3p) with IDENTITY geometry and
    zero weight in all padding, so physics kernels stay finite there."""
    ten, nelem, Q3 = qdata.shape
    Q3p = _round_up(Q3, 128)
    eye = np.zeros((10, 1, 1), qdata.dtype)
    eye[[1, 5, 9]] = 1.0                                 # dXdx = I, wdetJ = 0
    out = jnp.broadcast_to(jnp.asarray(eye), (10, nelem_pad, Q3p))
    return out.at[:, :nelem, :Q3].set(qdata)


def _apply_kernel(*refs, planes_fn, phys, jacobian, stash_in, stash_out):
    """Shared kernel body.

    Ref order (Pallas: all inputs, then all outputs):
      ue, qdata, Kg, KgT, [stash_in], out, [stash_out]
    """
    f32 = jnp.float32
    ue_ref, qd_ref, kg_ref, kgt_ref = refs[:4]
    rest = refs[4:]
    if stash_in:
        sref, rest = rest[0], rest[1:]
    out_ref = rest[0]
    ue = [ue_ref[c] for c in range(3)]              # (BE, P3p) each
    du = Mat3([
        jnp.dot(ue[c], kg_ref[d], preferred_element_type=f32)
        for c in range(3) for d in range(3)
    ])
    qd = qd_ref[...]
    if jacobian:
        stash = Mat3([sref[k] for k in range(9)]) if stash_in else None
        dv = planes_fn(du, qd, stash, phys)
        new_stash = None
    else:
        dv, new_stash = planes_fn(du, qd, phys)
    for c in range(3):
        acc = jnp.dot(dv.m[3 * c], kgt_ref[0], preferred_element_type=f32)
        for d in (1, 2):
            acc = acc + jnp.dot(dv.m[3 * c + d], kgt_ref[d],
                                preferred_element_type=f32)
        out_ref[c] = acc
    if stash_out:
        sout = rest[1]
        for k in range(9):
            sout[k] = new_stash.m[k]


def make_fused_apply(planes_fn, phys, P3: int, Q3: int, nelem: int,
                     dtype, *, jacobian: bool = False, stash_in: bool = False,
                     stash_out: bool = False, block_elems: int = 256,
                     interpret: bool = False):
    """Build `fn(ue_pad, qdata_pad, Kg, KgT[, stash]) -> (ve_pad[, stash])`.

    ue_pad (3, e_pad, P3p); qdata_pad (10, e_pad, Q3p); stash (9, e_pad, Q3p);
    Kg (3, P3p, Q3p), KgT (3, Q3p, P3p) from `padded_grad_matrices`.
    """
    assert dtype == jnp.float32, "pallas apply path is f32-only"
    Q3p = _round_up(Q3, 128)
    P3p = _round_up(P3, 128)
    BE = block_elems
    e_pad = _round_up(max(nelem, BE), BE)
    grid = (e_pad // BE,)

    kernel = functools.partial(
        _apply_kernel, planes_fn=planes_fn, phys=phys,
        jacobian=jacobian, stash_in=stash_in, stash_out=stash_out,
    )

    ue_spec = pl.BlockSpec((3, BE, P3p), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    qd_spec = pl.BlockSpec((10, BE, Q3p), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    stash_spec = pl.BlockSpec((9, BE, Q3p), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    full3 = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0, 0),   # noqa: E731
                                     memory_space=pltpu.VMEM)

    in_specs = [ue_spec, qd_spec, full3((3, P3p, Q3p)), full3((3, Q3p, P3p))]
    if stash_in:
        in_specs.append(stash_spec)
    out_shape = [jax.ShapeDtypeStruct((3, e_pad, P3p), dtype)]
    out_specs = [ue_spec]
    if stash_out:
        out_shape.append(jax.ShapeDtypeStruct((9, e_pad, Q3p), dtype))
        out_specs.append(stash_spec)

    # rough cost: 2 GEMM sets of 9 (BE,P3p)x(P3p,Q3p) dots + physics
    # (helps the scheduler overlap DMA)
    flops = 2 * 9 * 2 * e_pad * P3p * Q3p
    nbytes = 4 * (3 * e_pad * P3p * 2 + 10 * e_pad * Q3p
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

    def fn(ue_pad, qdata_pad, Kg, KgT, stash=None):
        args = (ue_pad, qdata_pad, Kg, KgT)
        if stash_in:
            args = args + (stash,)
        return call(*args)

    fn.e_pad = e_pad
    fn.Q3p = Q3p
    fn.P3p = P3p
    return fn


def stash_view(stash, nelem: int, Q3: int):
    """Pallas stash (9, e_pad, Q3p) -> Mat3 of (nelem, Q3) views; Mat3
    passes through unchanged (XLA structured path)."""
    if isinstance(stash, Mat3) or stash is None:
        return stash
    return Mat3([stash[k, :nelem, :Q3] for k in range(9)])
