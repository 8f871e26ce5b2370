"""Exodus-II ingestion oracles (SURVEY stage 1 / hard part 6): volumes,
face sets, orientation (detJ > 0), MMS solve on a reference mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from ceedpetscsolid_tpu.mesh.exodus import read_exodus
from ceedpetscsolid_tpu.mesh.fespace import build_fespace
from ceedpetscsolid_tpu.ops.operator import OperatorFactory

MESHES = "/root/reference/meshes"


def _volume(mesh, degree=1):
    fes = build_fespace(mesh, degree)
    fac = OperatorFactory([fes], qextra=0)
    qd = fac.compute_qdata()
    return float(jnp.sum(qd[0])), np.asarray(qd[0]).min()


def test_cube8_unit_volume():
    m = read_exodus(f"{MESHES}/cube8_512e_6ss_s.exo")
    assert m.num_elements == 512
    vol, minw = _volume(m)
    assert np.isclose(vol, 1.0, rtol=1e-12)
    assert minw > 0          # consistent element orientation
    assert len(m.face_sets) == 6


def test_cylhole_analytic_volume():
    """cyl-hole: annulus R=1, r=0.5, height 10 -> V = 0.75*pi*10."""
    m = read_exodus(f"{MESHES}/cyl-hole_3140e_2ss_us.exo")
    vol, minw = _volume(m)
    assert minw > 0
    assert abs(vol - 0.75 * np.pi * 10) / vol < 2e-3
    assert set(m.face_sets) == {998, 999}


def test_hex27_corners_only():
    m = read_exodus(f"{MESHES}/cylinder27_672e_2ns_us.exo")
    assert m.connectivity.shape[1] == 8
    vol, minw = _volume(m)
    assert minw > 0 and vol > 0


def test_mms_on_exodus_cube():
    """Config-2 style oracle: MMS converges on the cube mesh at degree 2."""
    from ceedpetscsolid_tpu.problem import Config, ElasticityProblem

    cfg = Config(problem="linElas", degree=2, nu=0.3, E=1.0, forcing="mms",
                 mesh_file=f"{MESHES}/cube8_8e_6ss_s.exo", multigrid="none")
    prob = ElasticityProblem(cfg)
    info = prob.solve()
    assert info.converged
    # 8-element mesh at degree 2: coarse; reference pass bar is 0.05
    assert prob.mms_error(info.u) < 0.05
