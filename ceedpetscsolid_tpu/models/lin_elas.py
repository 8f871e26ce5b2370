"""Linear elasticity kernels (reference qfunctions/linElas.h).

sigma = lambda tr(eps) I + 2 mu eps with eps = sym(grad u); the Jacobian is
identical in structure (linElas.h:163-280). Energy and the 8-component
diagnostic follow linElas.h:285-479, including the reference's exact energy
expression (which uses `tr(eps)*mu` rather than `mu*(e00^2+e11^2+e22^2)`;
reproduced verbatim for oracle parity, linElas.h:363-366).

Plane-native kernels (`*_planes`) take/return `Mat3` plane tuples — views
into the structured pipeline's single GEMM output (ops/structured.py) —
plus thin (3,3,batch)-array adapters (`*_qf`) for the unstructured paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import (
    Mat3,
    Physics,
    mat_ddot,
    mat_scale_eye_plus,
    mat_trace,
    ref_to_phys_grad,
    sym,
    unpack_qdata,
    weight_test_grad,
)

name = "linElas"
nonlinear = False


def _sigma(e: Mat3, phys: Physics) -> Mat3:
    # Verbatim Voigt form of linElas.h:133-144:
    #   diag:     ss*((1-nu) e_ii + nu e_jj + nu e_kk)
    #   off-diag: ss*(1-2nu)/2 * e_ij   (= mu * e_ij -- NOTE: the reference
    #             applies mu, not 2mu, to the tensor shear strain; kept
    #             verbatim because its MMS forcing is consistent with this)
    # Closed form: sigma = lam tr(e) I + mu (e + diag(e)).
    ss = phys.E / ((1 + phys.nu) * (1 - 2 * phys.nu))
    lam_voigt = ss * phys.nu
    mu = ss * (1 - 2 * phys.nu) / 2
    tr = mat_trace(e)
    s = [mu * p for p in e.m]
    for d in range(3):
        s[4 * d] = s[4 * d] + mu * e.m[4 * d]
    return mat_scale_eye_plus(lam_voigt * tr, Mat3(s))


def residual_planes(du_ref: Mat3, qdata, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    gradu = ref_to_phys_grad(du_ref, dXdx)
    sigma = _sigma(sym(gradu), phys)
    return weight_test_grad(sigma, dXdx, wdetJ), None


def jacobian_planes(ddu_ref: Mat3, qdata, stash, phys: Physics) -> Mat3:
    # Linear problem: Jacobian action == residual operator (linElas.h:163).
    wdetJ, dXdx = unpack_qdata(qdata)
    graddu = ref_to_phys_grad(ddu_ref, dXdx)
    dsigma = _sigma(sym(graddu), phys)
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
    tr = mat_trace(e)
    shear = e[0, 1] ** 2 + e[0, 2] ** 2 + e[1, 2] ** 2
    # Verbatim reference expression (linElas.h:363-366)
    return (phys.lam * tr * tr / 2 + tr * phys.mu + shear * 2 * phys.mu) * wdetJ


def diagnostic_qf(u, du_ref, qdata, phys: Physics):
    """8 planes: ux,uy,uz, pressure, tr(e), e:e, 1+tr(e), energy density
    (linElas.h:376-479). u: (3, *batch)."""
    _, dXdx = unpack_qdata(qdata)
    e = sym(ref_to_phys_grad(Mat3.from_array(du_ref), dXdx))
    tr = mat_trace(e)
    ee = mat_ddot(e, e)
    shear = e[0, 1] ** 2 + e[0, 2] ** 2 + e[1, 2] ** 2
    energy = phys.lam * tr * tr / 2 + tr * phys.mu + shear * 2 * phys.mu
    return jnp.stack(
        [u[0], u[1], u[2], -phys.lam * tr, tr, ee, 1 + tr, energy], axis=0
    )
