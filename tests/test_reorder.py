"""Locality reordering invariants (mesh/reorder.py, SURVEY hard part 1) and
its effect on partition halo sizes."""

import numpy as np

from ceedpetscsolid_tpu.mesh.exodus import read_exodus
from ceedpetscsolid_tpu.mesh.fespace import build_fespace
from ceedpetscsolid_tpu.mesh.reorder import reorder_mesh
from ceedpetscsolid_tpu.parallel.partition import partition_space

MESH = "/root/reference/meshes/cyl-hole_672e_2ss_us.exo"


def _volume(mesh, degree=2):
    import jax.numpy as jnp

    from ceedpetscsolid_tpu.ops.operator import OperatorFactory

    fes = build_fespace(mesh, degree)
    fac = OperatorFactory([fes])
    qd = fac.compute_qdata()
    return float(jnp.sum(qd[0]))


def test_reorder_invariants():
    mesh = read_exodus(MESH)
    rmesh = reorder_mesh(mesh)
    # element/vertex counts and total volume are invariant
    assert rmesh.num_elements == mesh.num_elements
    assert rmesh.num_vertices == mesh.num_vertices
    assert np.isclose(_volume(rmesh), _volume(mesh), rtol=1e-12)
    # connectivity is a relabeling: sorted coordinates per element match
    def elem_coord_key(m):
        c = m.vertices[m.connectivity]              # (e, 8, 3)
        c = np.sort(c.reshape(m.num_elements, -1), axis=1)
        return c[np.lexsort(c.T)]
    np.testing.assert_allclose(elem_coord_key(rmesh), elem_coord_key(mesh))
    # face sets map to the same geometric faces (same centroid multiset)
    for k in mesh.face_sets:
        def face_centroids(m, fs):
            from ceedpetscsolid_tpu.mesh.core import FACE_VERTICES
            e, f = fs[:, 0], fs[:, 1]
            verts = m.connectivity[e[:, None], FACE_VERTICES[f]]
            cent = m.vertices[verts].mean(axis=1)
            return cent[np.lexsort(cent.T)]
        np.testing.assert_allclose(
            face_centroids(rmesh, rmesh.face_sets[k]),
            face_centroids(mesh, mesh.face_sets[k]), atol=1e-12)


def test_reorder_never_grows_halo():
    """'auto' evaluates candidate element orders (file order included) by
    measured block-halo cost, so the chosen order's contiguous-block
    partition halos cannot exceed the raw file order's by more than the
    proxy/exact mismatch."""
    mesh = read_exodus(MESH)
    rmesh = reorder_mesh(mesh)
    ndev = 8
    raw = partition_space(build_fespace(mesh, 2).conn,
                          build_fespace(mesh, 2).num_nodes, ndev).halo_stats()
    ro = partition_space(build_fespace(rmesh, 2).conn,
                         build_fespace(rmesh, 2).num_nodes, ndev).halo_stats()
    assert ro["total_ghosts"] <= raw["total_ghosts"] * 1.05 + 8


def test_sfc_beats_raw_on_scrambled_mesh():
    """Shuffle the element order; 'auto' must recover locality via Morton."""
    mesh = read_exodus(MESH)
    rng = np.random.default_rng(0)
    perm = rng.permutation(mesh.num_elements)
    from ceedpetscsolid_tpu.mesh.core import HexMesh
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    scrambled = HexMesh(
        vertices=mesh.vertices,
        connectivity=mesh.connectivity[perm],
        face_sets={k: np.stack([inv[v[:, 0]], v[:, 1]], axis=1)
                   for k, v in mesh.face_sets.items()},
    )
    fixed = reorder_mesh(scrambled)
    ndev = 8
    bad = partition_space(build_fespace(scrambled, 2).conn,
                          build_fespace(scrambled, 2).num_nodes,
                          ndev).halo_stats()
    good = partition_space(build_fespace(fixed, 2).conn,
                           build_fespace(fixed, 2).num_nodes,
                           ndev).halo_stats()
    assert good["total_ghosts"] < 0.5 * bad["total_ghosts"]
