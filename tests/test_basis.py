"""Oracles for quadrature + tensor bases (SURVEY build stage 2):
polynomial exactness, partition of unity, derivative correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

from ceedpetscsolid_tpu.ops import quadrature
from ceedpetscsolid_tpu.ops.basis import Basis1D, Basis3D, lagrange_matrices


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8])
def test_gauss_exactness(n):
    pts, wts = quadrature.gauss(n)
    for deg in range(2 * n):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert np.isclose(np.sum(wts * pts**deg), exact, atol=1e-13)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 8])
def test_lobatto_exactness(n):
    pts, wts = quadrature.gauss_lobatto(n)
    assert pts[0] == -1.0 and pts[-1] == 1.0
    for deg in range(2 * n - 3):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert np.isclose(np.sum(wts * pts**deg), exact, atol=1e-13)


@pytest.mark.parametrize("P,Q", [(2, 2), (3, 4), (4, 5), (5, 6)])
def test_lagrange_interp_exact_for_polys(P, Q):
    nodes, _ = quadrature.gauss_lobatto(P)
    pts, _ = quadrature.gauss(Q)
    B, D = lagrange_matrices(nodes, pts)
    # partition of unity and derivative-sum zero
    assert np.allclose(B.sum(axis=1), 1.0, atol=1e-13)
    assert np.allclose(D.sum(axis=1), 0.0, atol=1e-12)
    for deg in range(P):
        vals = nodes**deg
        assert np.allclose(B @ vals, pts**deg, atol=1e-12)
        dref = deg * pts ** (deg - 1) if deg > 0 else np.zeros_like(pts)
        assert np.allclose(D @ vals, dref, atol=1e-11)


def test_lagrange_collocation_identity():
    nodes, _ = quadrature.gauss_lobatto(4)
    B, _ = lagrange_matrices(nodes, nodes)
    assert np.allclose(B, np.eye(4), atol=1e-13)


def test_basis3d_grad_matches_analytic():
    b = Basis3D.create(4, 5, "gauss", jnp.float64)
    P = 4
    nodes = b.b1.nodes
    X, Y, Z = np.meshgrid(nodes, nodes, nodes, indexing="ij")
    # lattice order x fastest: flat = i + P*(j + P*k) -> transpose to (k,j,i)
    f = (X**2 * Y + Z**3).transpose(2, 1, 0).reshape(-1)
    ue = jnp.asarray(f)[None, None, :]          # (ncomp=1, nelem=1, P3)
    du = np.asarray(b.apply_grad(ue))[0, :, 0, :].T   # (Q3, 3)
    q = b.b1.qpts
    QX, QY, QZ = np.meshgrid(q, q, q, indexing="ij")
    qx = QX.transpose(2, 1, 0).ravel()
    qy = QY.transpose(2, 1, 0).ravel()
    qz = QZ.transpose(2, 1, 0).ravel()
    assert np.allclose(du[:, 0], 2 * qx * qy, atol=1e-11)
    assert np.allclose(du[:, 1], qx**2, atol=1e-11)
    assert np.allclose(du[:, 2], 3 * qz**2, atol=1e-11)


def test_basis3d_transpose_adjoint():
    b = Basis3D.create(3, 4, "gauss", jnp.float64)
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.normal(size=(3, 5, b.P3)))
    dv = jnp.asarray(rng.normal(size=(3, 3, 5, b.Q3)))
    lhs = jnp.sum(b.apply_grad(ue) * dv)
    rhs = jnp.sum(ue * b.apply_grad_T(dv))
    assert np.isclose(float(lhs), float(rhs), rtol=1e-12)
