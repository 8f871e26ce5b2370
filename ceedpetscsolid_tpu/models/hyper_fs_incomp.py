"""Nearly-incompressible finite-strain Neo-Hookean — the reference's
"INCOMP HACK" (qfunctions/hyperFSIncomp.h): the 2nd Piola-Kirchhoff stress
splits into

  * a deviatoric mu-part  S_mu = mu C^{-1} (2E) = mu (I - C^{-1}),
    integrated at FULL quadrature (HyperFSIncompF, hyperFSIncomp.h:144-283);
  * a pressure lambda-part S_p = (lambda log J) C^{-1}, UNDER-integrated at
    a single quadrature point per element (HyperFSPressureF,
    hyperFSIncomp.h:286-408; basis P->1 at src/setuplibceed.c:464-466 with
    its own Q=1 qdata, src/setuplibceed.c:404-454);

summed via a composite operator (src/setuplibceed.c:496-506, 910-919).
Jacobians: dS_mu = 2 mu C^{-1} dE C^{-1} (hyperFSIncomp.h:414-586);
dS_p = lambda (C^{-1}:dE) C^{-1} - 2 (lambda log J) C^{-1} dE C^{-1}
(hyperFSIncomp.h:589-762). Energy is the standard compressible expression at
full quadrature (hyperFSIncomp.h:767-859); diagnostics reuse hyperFS's
(src/setuplibceed.c:93).
"""

from __future__ import annotations

from .base import (
    Mat3,
    Physics,
    log1p_series_shifted,
    mat_ddot,
    mat_eye_plus,
    mat_mul,
    mat_T1_mul,
    ref_to_phys_grad,
    unpack_qdata,
    weight_test_grad,
)
from .hyper_fs import _det_cm1, _green_lagrange_2E, _sym_inv
from .hyper_fs import diagnostic_qf as _fs_diagnostic_qf
from .hyper_fs import energy_qf as _fs_energy_qf

name = "hyperFSIncomp"
nonlinear = True
composite = True  # has an additional reduced-integration pressure operator


def _common(gradu: Mat3):
    """E2 = 2E, detC-1, Cinv (commonFS_incomp, hyperFSIncomp.h:69-137)."""
    E2 = _green_lagrange_2E(gradu)
    detC_m1 = _det_cm1(E2)
    C = mat_eye_plus(E2)
    Cinv = _sym_inv(C, detC_m1 + 1.0)
    return E2, detC_m1, Cinv


# ---------------------------------------------------------------------------
# Deviatoric mu-part (full quadrature)
# ---------------------------------------------------------------------------
def residual_planes(du_ref: Mat3, qdata, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    gradu = ref_to_phys_grad(du_ref, dXdx)
    E2, _, Cinv = _common(gradu)
    S = phys.mu * mat_mul(Cinv, E2)
    F = mat_eye_plus(gradu)
    P = mat_mul(F, S)
    return weight_test_grad(P, dXdx, wdetJ), gradu


def jacobian_planes(ddu_ref: Mat3, qdata, gradu: Mat3, phys: Physics) -> Mat3:
    wdetJ, dXdx = unpack_qdata(qdata)
    graddu = ref_to_phys_grad(ddu_ref, dXdx)
    E2, _, Cinv = _common(gradu)
    S = phys.mu * mat_mul(Cinv, E2)
    F = mat_eye_plus(gradu)
    gTF = mat_T1_mul(graddu, F)
    dE = 0.5 * (gTF + gTF.T)
    dS = 2.0 * phys.mu * mat_mul(Cinv, mat_mul(dE, Cinv))
    dP = mat_mul(graddu, S) + mat_mul(F, dS)
    return weight_test_grad(dP, dXdx, wdetJ)


# ---------------------------------------------------------------------------
# Pressure lambda-part (reduced integration, Q=1)
# ---------------------------------------------------------------------------
def pressure_residual_planes(du_ref: Mat3, qdata, phys: Physics):
    wdetJ, dXdx = unpack_qdata(qdata)
    gradu = ref_to_phys_grad(du_ref, dXdx)
    _, detC_m1, Cinv = _common(gradu)
    llnj = phys.lam * log1p_series_shifted(detC_m1) / 2.0
    S = llnj * Cinv
    F = mat_eye_plus(gradu)
    P = mat_mul(F, S)
    return weight_test_grad(P, dXdx, wdetJ), gradu


def pressure_jacobian_planes(ddu_ref: Mat3, qdata, gradu: Mat3,
                             phys: Physics) -> Mat3:
    wdetJ, dXdx = unpack_qdata(qdata)
    graddu = ref_to_phys_grad(ddu_ref, dXdx)
    _, detC_m1, Cinv = _common(gradu)
    llnj = phys.lam * log1p_series_shifted(detC_m1) / 2.0
    S = llnj * Cinv
    F = mat_eye_plus(gradu)
    gTF = mat_T1_mul(graddu, F)
    dE = 0.5 * (gTF + gTF.T)
    cinv_dE = mat_ddot(Cinv, dE)
    CidECi = mat_mul(Cinv, mat_mul(dE, Cinv))
    dS = phys.lam * cinv_dE * Cinv - 2.0 * llnj * CidECi
    dP = mat_mul(graddu, S) + mat_mul(F, dS)
    return weight_test_grad(dP, dXdx, wdetJ)


# -- (3, 3, *batch)-array adapters ------------------------------------------
def residual_qf(du_ref, qdata, phys: Physics):
    dv, stash = residual_planes(Mat3.from_array(du_ref), qdata, phys)
    return dv.to_array(), stash


def jacobian_qf(ddu_ref, qdata, stash, phys: Physics):
    return jacobian_planes(Mat3.from_array(ddu_ref), qdata, stash, phys).to_array()


def pressure_residual_qf(du_ref, qdata, phys: Physics):
    dv, stash = pressure_residual_planes(Mat3.from_array(du_ref), qdata, phys)
    return dv.to_array(), stash


def pressure_jacobian_qf(ddu_ref, qdata, stash, phys: Physics):
    return pressure_jacobian_planes(
        Mat3.from_array(ddu_ref), qdata, stash, phys
    ).to_array()


# ---------------------------------------------------------------------------
energy_qf = _fs_energy_qf          # hyperFSIncomp.h:767-859 == hyperFS form
diagnostic_qf = _fs_diagnostic_qf  # src/setuplibceed.c:93
