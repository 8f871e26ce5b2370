"""Neo-Hookean hyperelasticity at small strain (reference qfunctions/hyperSS.h).

sigma = lambda log(1 + e_v) I + 2 mu eps, with e_v = tr(eps); the Newton
linearization replaces lambda by lambda_bar = lambda/(1 + e_v)
(hyperSS.h:293-302). The residual stashes the PHYSICAL gradient gradu for
the Jacobian (hyperSS.h:69-70, 115-120).

Plane-native kernels over `Mat3` plane tuples (see models/base.py) with
array adapters for the unstructured paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import (
    Mat3,
    Physics,
    log1p_series,
    mat_ddot,
    mat_scale_eye_plus,
    mat_trace,
    ref_to_phys_grad,
    sym,
    unpack_qdata,
    weight_test_grad,
)

name = "hyperSS"
nonlinear = True


def residual_planes(du_ref: Mat3, qdata, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    gradu = ref_to_phys_grad(du_ref, dXdx)
    e = sym(gradu)
    ev = mat_trace(e)
    llv = log1p_series(ev)
    # hyperSS.h:156-163: diag lambda*llv + 2mu*e_ii; off-diag 2mu*e_ij
    sigma = mat_scale_eye_plus(phys.lam * llv, phys.two_mu * e)
    return weight_test_grad(sigma, dXdx, wdetJ), gradu


def jacobian_planes(ddu_ref: Mat3, qdata, gradu: Mat3, phys: Physics) -> Mat3:
    wdetJ, dXdx = unpack_qdata(qdata)
    graddu = ref_to_phys_grad(ddu_ref, dXdx)
    de = sym(graddu)
    # lambda_bar from the STASHED state gradient (hyperSS.h:294-295)
    ev = gradu[0, 0] + gradu[1, 1] + gradu[2, 2]
    lam_bar = phys.lam / (1 + ev)
    dtr = mat_trace(de)
    dsigma = mat_scale_eye_plus(lam_bar * dtr, phys.two_mu * de)
    return weight_test_grad(dsigma, dXdx, wdetJ)


# -- (3, 3, *batch)-array adapters ------------------------------------------
def residual_qf(du_ref, qdata, phys: Physics):
    dv, stash = residual_planes(Mat3.from_array(du_ref), qdata, phys)
    return dv.to_array(), stash


def jacobian_qf(ddu_ref, qdata, stash, phys: Physics):
    return jacobian_planes(Mat3.from_array(ddu_ref), qdata, stash, phys).to_array()


def energy_qf(du_ref, qdata, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    e = sym(ref_to_phys_grad(Mat3.from_array(du_ref), dXdx))
    ev = mat_trace(e)
    llv = log1p_series(ev)
    shear = e[0, 1] ** 2 + e[0, 2] ** 2 + e[1, 2] ** 2
    # Verbatim hyperSS.h:405-408
    return (
        phys.lam * (1 + ev) * (llv - 1) + ev * phys.mu + shear * 2 * phys.mu
    ) * wdetJ


def diagnostic_qf(u, du_ref, qdata, phys: Physics):
    """hyperSS.h:418-522. u: (3, *batch)."""
    _, dXdx = unpack_qdata(qdata)
    e = sym(ref_to_phys_grad(Mat3.from_array(du_ref), dXdx))
    ev = mat_trace(e)
    llv = log1p_series(ev)
    ee = mat_ddot(e, e)
    shear = e[0, 1] ** 2 + e[0, 2] ** 2 + e[1, 2] ** 2
    energy = phys.lam * (1 + ev) * (llv - 1) + ev * phys.mu + shear * 2 * phys.mu
    return jnp.stack(
        [u[0], u[1], u[2], -phys.lam * llv, ev, ee, 1 + ev, energy], axis=0
    )
