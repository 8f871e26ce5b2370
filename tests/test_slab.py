"""Slab-spectral distributed pipeline oracles (parallel/slab.py): the
per-shard spectral fold on box meshes must reproduce the serial solve
bitwise-tight, for plain and composite models, across shard counts — the
rank-count invariance contract of the reference (same per-rank
CeedOperators under any mpiexec -n N, src/matops.c:26-60)."""

import numpy as np
import pytest

from ceedpetscsolid_tpu.problem import Config, ElasticityProblem
from ceedpetscsolid_tpu.parallel.driver import DistributedProblem


@pytest.fixture(scope="module")
def hyperfs_box():
    cfg = Config(problem="hyperFS", degree=3, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(2, 2, 8), multigrid="logarithmic",
                 num_increments=1)
    prob = ElasticityProblem(cfg)
    return prob, prob.solve()


@pytest.mark.parametrize("ndev", [2, 4])
def test_slab_spectral_matches_serial(hyperfs_box, ndev):
    prob, sinfo = hyperfs_box
    dp = DistributedProblem(prob, ndev=ndev)
    assert dp.slab is not None, "slab mode must auto-enable on box meshes"
    u, dinfo = dp.solve()
    assert dinfo["converged"]
    err = float(np.abs(u - np.asarray(sinfo.u)).max())
    assert err < 1e-10, err


def test_slab_ragged_sizes(hyperfs_box):
    """ez=8 over 3 shards: ragged slabs (3,3,2) with zero-padded tails."""
    prob, sinfo = hyperfs_box
    dp = DistributedProblem(prob, ndev=3)
    assert dp.slab is not None
    u, dinfo = dp.solve()
    err = float(np.abs(u - np.asarray(sinfo.u)).max())
    assert err < 1e-10, err


def test_slab_composite_matches_serial():
    cfg = Config(problem="hyperFSIncomp", degree=2, nu=0.3, E=1.0,
                 test_mode=True, box_faces=(2, 2, 6),
                 multigrid="logarithmic", num_increments=1)
    prob = ElasticityProblem(cfg)
    sinfo = prob.solve()
    dp = DistributedProblem(prob, ndev=3)
    assert dp.slab is not None
    u, dinfo = dp.solve()
    err = float(np.abs(u - np.asarray(sinfo.u)).max())
    assert err < 1e-10, err


def test_slab_gating():
    """ndev > ez or unstructured mesh falls back to the row path."""
    cfg = Config(problem="linElas", degree=2, nu=0.3, E=1.0, test_mode=True,
                 box_faces=(3, 3, 3), multigrid="none")
    prob = ElasticityProblem(cfg)
    dp = DistributedProblem(prob, ndev=8)      # ez=3 < 8
    assert dp.slab is None
    with pytest.raises(ValueError):
        DistributedProblem(prob, ndev=8, use_slab=True)
