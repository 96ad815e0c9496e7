"""Config parser, PQR I/O, and fugacity tests."""

import os

import numpy as np
import pytest

from mpmcxx_tpu import constants as const
from mpmcxx_tpu.config.parser import ConfigError, parse_config, read_config
from mpmcxx_tpu.config.validate import validate
from mpmcxx_tpu.io import pqr
from mpmcxx_tpu.mc import fugacity as fug

SAMPLE = "/root/reference/sample-input/pi000-free-argon-2K"


class TestParser:
    def test_sample_input(self):
        cfg = read_config(os.path.join(SAMPLE, "input.in"))
        assert cfg.ensemble == const.ENSEMBLE_PATH_INTEGRAL_NVT
        assert cfg.temperature == 2.0
        assert cfg.numsteps == 100000
        assert cfg.corrtime == 20
        assert cfg.preset_seed == 1 and cfg.preset_seed_on
        assert cfg.bead_perturb_probability == 1.0
        assert cfg.PI_trial_chain_length == 4
        assert cfg.basis1 == [100.0, 0.0, 0.0]
        assert cfg.parallel_restarts
        assert not cfg.calc_hist
        assert cfg.job_name == "Ar2K"

    def test_comments_and_case(self):
        cfg = parse_config("! comment\n# another\nTEMPERATURE 42.5\n")
        assert cfg.temperature == 42.5

    def test_deprecated_keywords_fail(self):
        with pytest.raises(ConfigError, match="move_factor instead"):
            parse_config("move_probability 0.5\n")

    def test_unknown_keyword_fails(self):
        with pytest.raises(ConfigError, match="unknown keyword"):
            parse_config("bogus_keyword on\n")

    def test_user_fugacities(self):
        cfg = parse_config("user_fugacities 1.0 2.5 3.0\n")
        assert cfg.user_fugacities and cfg.fugacities == [1.0, 2.5, 3.0]

    def test_polar_damp_type(self):
        assert parse_config("polar_damp_type linear\n").damp_type == \
            const.DAMPING_LINEAR

    def test_validation_requires_steps(self):
        cfg = parse_config("ensemble nvt\ntemperature 100\ncorrtime 5\n")
        with pytest.raises(ConfigError, match="number of steps"):
            validate(cfg)

    def test_validation_defaults_filenames(self):
        cfg = parse_config("ensemble nvt\njob_name jj\ntemperature 100\n"
                           "numsteps 10\ncorrtime 5\n")
        validate(cfg)
        assert cfg.energy_output == "jj.energy.dat"
        assert cfg.pqr_restart == "jj.restart.pqr"
        assert cfg.pqr_output == "jj.final.pqr"


class TestPQR:
    def test_read_sample(self):
        atoms = pqr.read_pqr(os.path.join(SAMPLE, "Ar.pqr"))
        assert len(atoms) == 2  # BOX particles skipped
        assert atoms[0].mass == pytest.approx(39.948)
        assert atoms[0].sigma == pytest.approx(3.405)
        assert atoms[1].x == pytest.approx(1000.0)

    def test_read_restart_with_box(self):
        path = os.path.join(SAMPLE, "Ar2K.restart-0000.pqr")
        atoms = pqr.read_pqr(path)
        assert len(atoms) == 2
        basis = pqr.read_pqr_box(path)
        np.testing.assert_allclose(basis, np.eye(3) * 100.0)

    def test_make_filename(self):
        assert pqr.make_filename("foo.restart.pqr", 7) == \
            "foo.restart-0007.pqr"
        assert pqr.make_filename("foo", 3) == "foo-0003"
        assert pqr.make_filename("/dev/null", 1) == "/dev/null"

    def test_roundtrip(self, tmp_path):
        from mpmcxx_tpu.state import build_state
        atoms = pqr.read_pqr(os.path.join(SAMPLE, "Ar.pqr"))
        state, meta = build_state(atoms, np.eye(3) * 100.0)
        p = tmp_path / "out.pqr"
        pqr.write_state_pqr(str(p), state, meta, wrapall=True)
        pqr.drain()
        back = pqr.read_pqr(str(p))
        assert len(back) == 2
        assert back[0].sigma == pytest.approx(3.405)
        basis = pqr.read_pqr_box(str(p))
        np.testing.assert_allclose(basis, np.eye(3) * 100.0)
        # .last rotation
        pqr.write_state_pqr(str(p), state, meta)
        pqr.drain()
        assert (tmp_path / "out.pqr.last").exists()


class TestFugacity:
    def test_h2_zhou_77K(self):
        # Zhou: ideal-ish at low pressure, phi < 1
        f = fug.h2_fugacity(77.0, 1.0)
        assert f == pytest.approx(1.0, rel=0.01)
        f100 = fug.h2_fugacity(77.0, 100.0)
        assert 80.0 < f100 < 100.0

    def test_h2_shaw_roomtemp(self):
        f = fug.h2_fugacity(298.0, 100.0)
        assert f > 100.0  # H2 is super-ideal at room temperature

    def test_co2_pr(self):
        f = fug.co2_fugacity(298.0, 50.0)
        assert 0.0 < f < 50.0  # CO2 sub-ideal near critical T

    def test_back_vs_pr_ch4(self):
        fb = fug.ch4_fugacity(298.0, 50.0)
        fp = fug.pr_fugacity("ch4", 298.0, 50.0)
        assert fb == pytest.approx(fp, rel=0.05)

    def test_n2(self):
        f = fug.n2_fugacity(78.0, 0.5)
        assert f == pytest.approx(0.5, rel=0.01)
