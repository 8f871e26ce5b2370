"""Common physics-kernel plumbing.

Kernels are pure functions over arbitrary leading batch dims (typically
(nelem, Q3)), the vectorized analog of libCEED QFunctions' quadrature-point
loops. Conventions (matching qfunctions/*.h of the reference):

  du_ref[..., c, m] : d u_c / d X_m   (REFERENCE-coordinate gradient,
                                       produced by the basis grad action)
  qdata[..., 0]     : w * detJ
  qdata[..., 1:10]  : dXdx row-major; dXdx[m, k] = d X_m / d x_k
  dv_ref[..., c, k] : test-function gradient coefficient, already weighted,
                      ready for the transpose basis grad action

Physical gradient: gradu[..., c, k] = sum_m du_ref[..., c, m] dXdx[..., m, k]
Output weighting:  dv_ref[..., c, k] = sum_m sigma[..., c, m] dXdx[..., k, m] * wdetJ
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


def unpack_qdata(qdata: jnp.ndarray):
    """qdata (..., 10) -> (wdetJ (...,), dXdx (..., 3, 3))."""
    wdetJ = qdata[..., 0]
    dXdx = qdata[..., 1:10].reshape(qdata.shape[:-1] + (3, 3))
    return wdetJ, dXdx


def ref_to_phys_grad(du_ref: jnp.ndarray, dXdx: jnp.ndarray) -> jnp.ndarray:
    """gradu[..., c, k] = sum_m du_ref[..., c, m] * dXdx[..., m, k]."""
    return jnp.einsum("...cm,...mk->...ck", du_ref, dXdx)


def weight_test_grad(sigma: jnp.ndarray, dXdx: jnp.ndarray, wdetJ: jnp.ndarray) -> jnp.ndarray:
    """dv_ref[..., c, k] = sum_m sigma[..., c, m] dXdx[..., k, m] * wdetJ."""
    return jnp.einsum("...cm,...km->...ck", sigma, dXdx) * wdetJ[..., None, None]


def sym(g: jnp.ndarray) -> jnp.ndarray:
    """Symmetric part: 1/2 (g + g^T) over the trailing (3,3)."""
    return 0.5 * (g + jnp.swapaxes(g, -1, -2))


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
