"""Mesh + FE-space oracles (SURVEY build stages 1 & 3): node counts,
coordinates, continuity across elements, multiplicity, volume integrals."""

import jax.numpy as jnp
import numpy as np
import pytest

from ceedpetscsolid_tpu.mesh.box import box_mesh
from ceedpetscsolid_tpu.mesh.fespace import build_fespace
from ceedpetscsolid_tpu.ops.operator import OperatorFactory


def test_box_mesh_counts():
    m = box_mesh((3, 4, 5))
    assert m.num_vertices == 4 * 5 * 6
    assert m.num_elements == 60
    assert len(m.boundary_faces()) == 2 * (3 * 4 + 4 * 5 + 3 * 5)


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_fespace_node_count_box(degree):
    n = (3, 3, 3)
    m = box_mesh(n)
    fes = build_fespace(m, degree)
    expect = (degree * n[0] + 1) * (degree * n[1] + 1) * (degree * n[2] + 1)
    assert fes.num_nodes == expect
    assert fes.conn.shape == (27, (degree + 1) ** 3)
    # every node referenced at least once
    assert np.unique(fes.conn).size == fes.num_nodes


@pytest.mark.parametrize("degree", [2, 3])
def test_fespace_coords_continuous(degree):
    """Shared lattice nodes must land at identical coordinates from both
    elements -> interpolating x,y,z through conn is single-valued."""
    m = box_mesh((2, 2, 2), upper=(2.0, 1.0, 1.5))
    fes = build_fespace(m, degree)
    # coordinates of node gathered per element must agree with fes.coords
    for e in range(fes.num_elements):
        ids = fes.conn[e]
        assert np.all(np.isfinite(fes.coords[ids]))
    # boundary nodes on face set 6 (x=xmin) all have x == 0
    nodes = fes.face_set_nodes(6)
    assert nodes.size == (degree * 2 + 1) ** 2
    assert np.allclose(fes.coords[nodes, 0], 0.0, atol=1e-14)
    nodes5 = fes.face_set_nodes(5)
    assert np.allclose(fes.coords[nodes5, 0], 2.0, atol=1e-14)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_multiplicity_box(degree):
    m = box_mesh((2, 2, 2))
    fes = build_fespace(m, degree)
    mult = fes.multiplicity()
    # center vertex of the 2x2x2 box is shared by 8 elements
    center = np.argmin(np.linalg.norm(fes.coords - 0.5, axis=1))
    assert mult[center] == 8
    assert mult.min() >= 1
    assert mult.sum() == fes.num_elements * (degree + 1) ** 3


@pytest.mark.parametrize("degree,qextra", [(1, 0), (2, 0), (3, 1)])
def test_qdata_volume(degree, qextra):
    """sum(w detJ) == volume; dXdx inverts the coordinate Jacobian."""
    m = box_mesh((3, 2, 2), upper=(2.0, 1.0, 3.0))
    fes = build_fespace(m, degree)
    fac = OperatorFactory([fes], qextra=qextra)
    qd = fac.compute_qdata()
    vol = float(jnp.sum(qd[0]))
    assert np.isclose(vol, 2.0 * 1.0 * 3.0, rtol=1e-12)
    assert np.all(np.asarray(qd[0]) > 0)


def test_interp_field_continuity_random_mesh_perm():
    """Interpolating a global linear field must be exact (continuity +
    correct orientation handling): gradient of (a.x) is constant a."""
    m = box_mesh((2, 3, 2), upper=(1.0, 2.0, 1.0))
    # permute element order and vertex numbering to stress orientation code
    rng = np.random.default_rng(42)
    perm = rng.permutation(m.num_elements)
    m.connectivity = m.connectivity[perm]
    for degree in (2, 3):
        fes = build_fespace(m, degree)
        fac = OperatorFactory([fes], qextra=0)
        qd = fac.compute_qdata()
        a = np.array([1.3, -0.7, 2.1])
        u_cm = np.broadcast_to(fes.coords @ a, (3, fes.num_nodes))
        restr, basis = fac.fine.restr, fac.fine.basis
        du = basis.apply_grad(restr.gather(jnp.asarray(u_cm)))  # (c,m,e,q)
        dXdx = qd[1:].reshape(3, 3, qd.shape[1], qd.shape[2])
        grad_phys = jnp.einsum("cmeq,mkeq->ckeq", du, dXdx)
        err = np.asarray(grad_phys) - a[None, :, None, None]
        assert np.abs(err).max() < 1e-10
