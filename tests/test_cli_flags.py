"""CLI flag coverage (VERDICT r5 item 10): -snes_monitor per-increment
energy trace, -snes_ksp_ew acceptance, and the HDF5-Exodus error hint."""

import numpy as np
import pytest

from ceedpetscsolid_tpu import cli


def test_snes_monitor_prints_energy(capsys):
    cli.main(["-test", "-degree", "2", "-nu", "0.3", "-E", "1",
              "-dm_plex_box_faces", "2,2,2", "-snes_monitor"])
    out = capsys.readouterr().out
    assert "Load Increment" in out
    assert "energy" in out
    # energy value parses and is positive (MMS deformation stores energy)
    line = [ln for ln in out.splitlines() if "energy" in ln][-1]
    val = float(line.split("energy")[1].strip())
    assert np.isfinite(val) and val > 0


def test_snes_ksp_ew_flag_accepted():
    cfg = cli.build_config({"test": True, "degree": "2", "nu": "0.3",
                            "E": "1", "dm_plex_box_faces": "2,2,2",
                            "snes_ksp_ew": True})[0]
    assert cfg.newton.ew is True


def test_hdf5_exodus_error_hint(tmp_path):
    from ceedpetscsolid_tpu.mesh.exodus import read_exodus
    bad = tmp_path / "h5.exo"
    bad.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)   # HDF5 magic
    with pytest.raises(ValueError, match="ncks -3"):
        read_exodus(str(bad))
