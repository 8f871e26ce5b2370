"""Neo-Hookean hyperelasticity at finite strain, total Lagrangian
(reference qfunctions/hyperFS.h).

Stable formulation: E = 1/2(gradu + gradu^T + gradu^T gradu) via the 2E work
array, C = I + 2E, S = (lambda log J) C^{-1} + mu C^{-1} (2E)
(hyperFS.h:85-142 via commonFS), P = F S, with det(C) - 1 computed in the
cancellation-free expanded form (hyperFS.h:72-80) and log J through the
shifted log1p series (hyperFS.h:45-67). Analytic Newton linearization:
dS = lambda (C^{-1}:dE) C^{-1} - 2(lambda log J - mu) C^{-1} dE C^{-1},
dP = graddu S + F dS (hyperFS.h:414-451).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import (
    Physics,
    log1p_series_shifted,
    ref_to_phys_grad,
    unpack_qdata,
    weight_test_grad,
)

name = "hyperFS"
nonlinear = True


def _det_cm1(E2: jnp.ndarray) -> jnp.ndarray:
    """det(I + E2) - 1 in expanded cancellation-free form (hyperFS.h:72-80).

    E2 = 2 * Green-Lagrange strain, symmetric (..., 3, 3).
    """
    e00, e11, e22 = E2[..., 0, 0], E2[..., 1, 1], E2[..., 2, 2]
    e12, e02, e01 = E2[..., 1, 2], E2[..., 0, 2], E2[..., 0, 1]
    return (
        e00 * (e11 * e22 - e12 * e12)
        + e01 * (e02 * e12 - e01 * e22)
        + e02 * (e01 * e12 - e02 * e11)
        + e00 + e11 + e22
        + e00 * e11 + e00 * e22 + e11 * e22
        - e01 * e01 - e02 * e02 - e12 * e12
    )


def _sym_inv(C: jnp.ndarray, det: jnp.ndarray) -> jnp.ndarray:
    """Inverse of symmetric 3x3 via adjugate / det (hyperFS.h:115-124)."""
    a00 = C[..., 1, 1] * C[..., 2, 2] - C[..., 1, 2] * C[..., 2, 1]
    a11 = C[..., 0, 0] * C[..., 2, 2] - C[..., 0, 2] * C[..., 2, 0]
    a22 = C[..., 0, 0] * C[..., 1, 1] - C[..., 0, 1] * C[..., 1, 0]
    a12 = C[..., 0, 2] * C[..., 1, 0] - C[..., 0, 0] * C[..., 1, 2]
    a02 = C[..., 0, 1] * C[..., 1, 2] - C[..., 0, 2] * C[..., 1, 1]
    a01 = C[..., 0, 2] * C[..., 2, 1] - C[..., 0, 1] * C[..., 2, 2]
    row0 = jnp.stack([a00, a01, a02], axis=-1)
    row1 = jnp.stack([a01, a11, a12], axis=-1)
    row2 = jnp.stack([a02, a12, a22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) / det[..., None, None]


def common_fs(gradu: jnp.ndarray, phys: Physics):
    """commonFS (hyperFS.h:85-142): returns (S, Cinv, detC_m1, llnj, E2)."""
    E2 = gradu + jnp.swapaxes(gradu, -1, -2) + jnp.einsum(
        "...nj,...nk->...jk", gradu, gradu
    )
    detC_m1 = _det_cm1(E2)
    C = jnp.eye(3, dtype=gradu.dtype) + E2
    Cinv = _sym_inv(C, detC_m1 + 1.0)
    llnj = phys.lam * log1p_series_shifted(detC_m1) / 2.0
    S = llnj[..., None, None] * Cinv + phys.mu * jnp.einsum(
        "...jn,...nk->...jk", Cinv, E2
    )
    return S, Cinv, detC_m1, llnj, E2


def residual_qf(du_ref, qdata, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    gradu = ref_to_phys_grad(du_ref, dXdx)
    S, _, _, _, _ = common_fs(gradu, phys)
    F = jnp.eye(3, dtype=gradu.dtype) + gradu
    P = jnp.einsum("...jm,...mk->...jk", F, S)
    return weight_test_grad(P, dXdx, wdetJ), gradu


def jacobian_qf(ddu_ref, qdata, gradu, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    graddu = ref_to_phys_grad(ddu_ref, dXdx)
    S, Cinv, _, llnj, _ = common_fs(gradu, phys)
    F = jnp.eye(3, dtype=gradu.dtype) + gradu
    # dE = 1/2 (graddu^T F + F^T graddu)  (hyperFS.h:382-389)
    dE = 0.5 * (
        jnp.einsum("...nj,...nk->...jk", graddu, F)
        + jnp.einsum("...nj,...nk->...jk", F, graddu)
    )
    cinv_dE = jnp.einsum("...jk,...jk->...", Cinv, dE)
    CidECi = jnp.einsum("...jm,...mn,...nk->...jk", Cinv, dE, Cinv)
    dS = (
        phys.lam * cinv_dE[..., None, None] * Cinv
        - 2.0 * (llnj - phys.mu)[..., None, None] * CidECi
    )
    dP = jnp.einsum("...jm,...mk->...jk", graddu, S) + jnp.einsum(
        "...jm,...mk->...jk", F, dS
    )
    return weight_test_grad(dP, dXdx, wdetJ)


def energy_qf(du_ref, qdata, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    gradu = ref_to_phys_grad(du_ref, dXdx)
    E2 = gradu + jnp.swapaxes(gradu, -1, -2) + jnp.einsum(
        "...nj,...nk->...jk", gradu, gradu
    )
    detC_m1 = _det_cm1(E2)
    logj = log1p_series_shifted(detC_m1) / 2.0
    trE2 = jnp.trace(E2, axis1=-2, axis2=-1)
    # hyperFS.h:546-549
    return (phys.lam * logj * logj / 2 - phys.mu * logj + phys.mu * trE2 / 2) * wdetJ


def diagnostic_qf(u, du_ref, qdata, phys: Physics):
    """hyperFS.h:559-661."""
    _, dXdx = unpack_qdata(qdata)
    gradu = ref_to_phys_grad(du_ref, dXdx)
    E2 = gradu + jnp.swapaxes(gradu, -1, -2) + jnp.einsum(
        "...nj,...nk->...jk", gradu, gradu
    )
    detC_m1 = _det_cm1(E2)
    logj = log1p_series_shifted(detC_m1) / 2.0
    trE2 = jnp.trace(E2, axis1=-2, axis2=-1)
    E2E2 = jnp.sum(E2 * jnp.swapaxes(E2, -1, -2), axis=(-2, -1))
    energy = phys.lam * logj * logj / 2 - phys.mu * logj + phys.mu * trE2 / 2
    return jnp.stack(
        [
            u[..., 0], u[..., 1], u[..., 2],
            -phys.lam * logj,
            trE2 / 2, E2E2 / 4, jnp.sqrt(detC_m1 + 1), energy,
        ],
        axis=-1,
    )
