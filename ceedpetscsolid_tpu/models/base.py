"""Common physics-kernel plumbing.

Kernels are pure functions over quadrature-point batches, the vectorized
analog of libCEED QFunctions' loops. TPU-first data layout: every 3x3
tensor field is stored COMPONENT-MAJOR as an array of shape
(3, 3, *batch) — nine (nelem, Q3) "planes" — so each elementwise op runs
over the long batch dims in the minor-most (lane) axis at full VPU
utilization. (A (batch, 3, 3) layout would pad the trailing 3 up to the
128-lane tile: a 42x waste, measured 8-10x slower end-to-end.)

Conventions (matching qfunctions/*.h of the reference):

  du_ref[c, m]  : d u_c / d X_m  (REFERENCE-coordinate gradient planes,
                                  produced by the basis grad action)
  qdata[0]      : w * detJ                  (plane of shape (nelem, Q3))
  qdata[1+3m+k] : dXdx[m, k] = d X_m / d x_k
  dv_ref[c, k]  : weighted test-function gradient planes, ready for the
                  transpose basis grad action

Physical gradient: gradu[c, k] = sum_m du_ref[c, m] dXdx[m, k]
Output weighting:  dv_ref[c, k] = sum_m sigma[c, m] dXdx[k, m] * wdetJ
(see e.g. linElas.h:86-94 and linElas.h:147-153).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Physics:
    """Material parameters (reference elasticity.h:33-36)."""

    nu: float   # Poisson's ratio
    E: float    # Young's modulus (already scaled to model units)

    @property
    def two_mu(self) -> float:
        return self.E / (1 + self.nu)

    @property
    def mu(self) -> float:
        return self.two_mu / 2

    @property
    def bulk(self) -> float:
        return self.E / (3 * (1 - 2 * self.nu))

    @property
    def lam(self) -> float:
        # lambda = (3K - 2mu)/3, as in linElas.h:302-305
        return (3 * self.bulk - self.two_mu) / 3


# ---------------------------------------------------------------------------
# Component-major 3x3 "plane" algebra: arrays shaped (3, 3, *batch).
# Contractions over the leading 3x3 unroll into 27 fused multiply-adds on
# full-lane (nelem, Q3) planes; no einsum over tiny trailing axes.
# ---------------------------------------------------------------------------
def _m33(rows):
    """Build a (3, 3, *batch) plane tensor from a 3x3 nested list."""
    return jnp.stack([jnp.stack(r) for r in rows])


def mat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(A B)[j, k] = sum_m A[j, m] B[m, k] over leading (3,3) planes.

    Explicitly unrolled: an einsum here would lower to a batched 3x3
    dot_general with the long (nelem, Q) axes as batch dims, forcing
    full-tensor transposes around tiny MXU ops. Unrolled FMAs on planes
    stay on the VPU at full lanes.
    """
    return _m33(
        [[a[j, 0] * b[0, k] + a[j, 1] * b[1, k] + a[j, 2] * b[2, k]
          for k in range(3)] for j in range(3)]
    )


def mat_mul_T2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(A B^T)[j, k] = sum_m A[j, m] B[k, m]."""
    return _m33(
        [[a[j, 0] * b[k, 0] + a[j, 1] * b[k, 1] + a[j, 2] * b[k, 2]
          for k in range(3)] for j in range(3)]
    )


def mat_T1_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(A^T B)[j, k] = sum_n A[n, j] B[n, k]."""
    return _m33(
        [[a[0, j] * b[0, k] + a[1, j] * b[1, k] + a[2, j] * b[2, k]
          for k in range(3)] for j in range(3)]
    )


def mat_transpose(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(a, 0, 1)


def mat_trace(a: jnp.ndarray) -> jnp.ndarray:
    return a[0, 0] + a[1, 1] + a[2, 2]


def mat_ddot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """A : B = sum_jk A[j,k] B[j,k]."""
    acc = a[0, 0] * b[0, 0]
    for j in range(3):
        for k in range(3):
            if j or k:
                acc = acc + a[j, k] * b[j, k]
    return acc


def mat_eye_plus(a: jnp.ndarray) -> jnp.ndarray:
    """I + A without materializing a broadcast identity."""
    return a.at[0, 0].add(1.0).at[1, 1].add(1.0).at[2, 2].add(1.0)


def mat_scale_eye_plus(s: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """s*I + A (s is a batch-shaped plane)."""
    return a.at[0, 0].add(s).at[1, 1].add(s).at[2, 2].add(s)


def unpack_qdata(qdata: jnp.ndarray):
    """qdata (10, *batch) -> (wdetJ (*batch,), dXdx (3, 3, *batch))."""
    wdetJ = qdata[0]
    dXdx = qdata[1:10].reshape((3, 3) + qdata.shape[1:])
    return wdetJ, dXdx


def ref_to_phys_grad(du_ref: jnp.ndarray, dXdx: jnp.ndarray) -> jnp.ndarray:
    """gradu[c, k] = sum_m du_ref[c, m] * dXdx[m, k]."""
    return mat_mul(du_ref, dXdx)


def weight_test_grad(sigma: jnp.ndarray, dXdx: jnp.ndarray, wdetJ: jnp.ndarray) -> jnp.ndarray:
    """dv_ref[c, k] = sum_m sigma[c, m] dXdx[k, m] * wdetJ."""
    return mat_mul_T2(sigma, dXdx) * wdetJ


def sym(g: jnp.ndarray) -> jnp.ndarray:
    """Symmetric part: 1/2 (g + g^T) over the leading (3,3)."""
    return 0.5 * (g + mat_transpose(g))


def log1p_series(x: jnp.ndarray) -> jnp.ndarray:
    """Vectorized log1p Pade-free series of the reference (hyperSS.h:43-55).

    Accurate to ~1e-7 on sqrt(2)/2 < 1+x < sqrt(2), machine precision near 0.
    Kept for bitwise-comparable parity with the reference kernels.
    """
    y = x / (2.0 + x)
    y2 = y * y
    s = y
    y = y * y2
    s = s + y / 3
    y = y * y2
    s = s + y / 5
    y = y * y2
    s = s + y / 7
    return 2 * s


def log1p_series_shifted(x: jnp.ndarray) -> jnp.ndarray:
    """Range-extended series (hyperFS.h:45-67): valid 0.35 < 1+x < 2.83."""
    left = jnp.sqrt(2.0) / 2 - 1
    right = jnp.sqrt(2.0) - 1
    shift_down = x < left
    shift_up = x > right
    x_adj = jnp.where(shift_down, 1 + 2 * x, jnp.where(shift_up, (x - 1) / 2, x))
    base = jnp.where(
        shift_down, -jnp.log(2.0) / 2, jnp.where(shift_up, jnp.log(2.0) / 2, 0.0)
    )
    return 2 * base + log1p_series(x_adj)
