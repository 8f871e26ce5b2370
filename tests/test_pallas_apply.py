"""Fused Pallas apply kernel vs the XLA structured pipeline.

Runs the kernel in Pallas interpreter mode on the CPU backend (the compiled
Mosaic path is validated on hardware by scripts/validate_hot_paths.py); checks
the padding construction (lane padding to 128, element-row padding, identity
qdata in padded lanes) and residual/Jacobian/stash parity for a linear and a
nonlinear model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ceedpetscsolid_tpu.mesh.box import box_mesh
from ceedpetscsolid_tpu.mesh.fespace import build_fespace
from ceedpetscsolid_tpu.models import Physics, get_model
from ceedpetscsolid_tpu.ops.operator import OperatorFactory


@pytest.mark.parametrize("problem,degree", [("linElas", 3), ("hyperFS", 3)])
def test_pallas_matches_xla(problem, degree):
    mesh = box_mesh((3, 3, 3))
    fes = build_fespace(mesh, degree)
    dtype = jnp.float32

    plfac = OperatorFactory([fes], dtype=dtype, use_pallas=True,
                            pallas_interpret=True, block_elems=16)
    xfac = OperatorFactory([fes], dtype=dtype, use_pallas=False,
                           use_spectral=False)
    model = get_model(problem)
    phys = Physics(nu=0.3, E=1.0)

    qd = xfac.compute_qdata()
    qd_s = plfac.struct_qdata(qd)
    assert qd_s.shape[0] == 10 and qd_s.shape[2] % 128 == 0
    # padded lanes: identity geometry, zero weight
    Q3 = qd.shape[2]
    pad = np.asarray(qd_s[:, 0, Q3:])
    assert np.allclose(pad[0], 0.0)
    assert np.allclose(pad[[1, 5, 9]], 1.0)
    assert np.allclose(pad[[2, 3, 4, 6, 7, 8]], 0.0)

    rng = np.random.default_rng(3)
    N = fes.num_nodes
    u = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, dtype)
    v = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, dtype)

    res_pl = plfac.make_residual_structured(model.residual_planes, phys)
    res_x = xfac.make_residual_structured(model.residual_planes, phys)
    jac_pl = plfac.make_jacobian_structured(model.jacobian_planes, phys)
    jac_x = xfac.make_jacobian_structured(model.jacobian_planes, phys)

    r_pl, s_pl = res_pl(u, qd_s, plfac.fine.srestr, plfac.fine.sgrad)
    r_x, s_x = res_x(u, qd, xfac.fine.srestr, xfac.fine.sgrad)
    np.testing.assert_allclose(np.asarray(r_pl), np.asarray(r_x),
                               rtol=2e-5, atol=1e-8)

    if s_x is not None:
        sv = plfac.stash_view(s_pl)
        for a, b in zip(sv.m, s_x.m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)

    j_pl = jac_pl(v, qd_s, s_pl, plfac.fine.srestr, plfac.fine.sgrad)
    j_x = jac_x(v, qd, s_x, xfac.fine.srestr, xfac.fine.sgrad)
    np.testing.assert_allclose(np.asarray(j_pl), np.asarray(j_x),
                               rtol=2e-5, atol=1e-8)


@pytest.mark.parametrize("degree", [2, 3])
def test_pallas_unstructured_matches_xla(degree):
    """Stacked-operand kernel vs XLA row path on an UNSTRUCTURED mesh:
    exercises the orientation-masked operand blocks + perm-folded
    selection matrices (pallas_apply.ClassSpec / stacked_matrices)."""
    from ceedpetscsolid_tpu.mesh.exodus import read_exodus
    from ceedpetscsolid_tpu.mesh.reorder import reorder_mesh

    mesh = reorder_mesh(read_exodus(
        "/root/reference/meshes/cube8_216e_6ss_s.exo"))
    fes = build_fespace(mesh, degree)
    dtype = jnp.float32

    plfac = OperatorFactory([fes], dtype=dtype, use_pallas=True,
                            pallas_interpret=True, block_elems=16)
    xfac = OperatorFactory([fes], dtype=dtype, use_pallas=False,
                           use_spectral=False)
    spec = plfac._cls_specs[-1]
    if degree >= 3:      # 1-node entities (p=2) have only identity perms
        assert len(spec.face_perms) > 1, "mesh must exercise orientations"
    model = get_model("hyperFS")
    phys = Physics(nu=0.3, E=1.0)

    qd = xfac.compute_qdata()
    qd_s = plfac.struct_qdata(qd)

    rng = np.random.default_rng(7)
    N = fes.num_nodes
    u = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, dtype)
    v = jnp.asarray(rng.standard_normal((3, N)) * 1e-3, dtype)

    res_pl = plfac.make_residual_structured(model.residual_planes, phys)
    res_x = xfac.make_residual_structured(model.residual_planes, phys)
    r_pl, s_pl = res_pl(u, qd_s, plfac.fine.srestr, plfac.fine.sgrad)
    r_x, s_x = res_x(u, qd, xfac.fine.srestr, xfac.fine.sgrad)
    np.testing.assert_allclose(np.asarray(r_pl), np.asarray(r_x),
                               rtol=2e-5, atol=1e-8)

    sv = plfac.stash_view(s_pl)
    for a, b in zip(sv.m, s_x.m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)

    jac_pl = plfac.make_jacobian_structured(model.jacobian_planes, phys)
    jac_x = xfac.make_jacobian_structured(model.jacobian_planes, phys)
    j_pl = jac_pl(v, qd_s, s_pl, plfac.fine.srestr, plfac.fine.sgrad)
    j_x = jac_x(v, qd, s_x, xfac.fine.srestr, xfac.fine.sgrad)
    np.testing.assert_allclose(np.asarray(j_pl), np.asarray(j_x),
                               rtol=2e-5, atol=1e-8)
