"""Startup SIM_CONTROL echo parity: our resolved-configuration echo must
be line-identical to the reference binary's stdout for the examples/
inputs (check_config + init echo, src/SimulationControl.cpp:1617-2790,
:48-186).  Fixtures in tests/golden/sim_control/ were captured from the
compiled reference (.refbuild/mpmcxx) on these exact inputs."""

import io
import os

import numpy as np
import pytest

from mpmcxx_tpu.config.parser import read_config
from mpmcxx_tpu.io.output import display_sim_control

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIX = os.path.join(HERE, "golden", "sim_control")

AR_LINE = ("ATOM      1 Ar   Ar  M    1      0.000   0.000   0.000 "
           "39.94800  0.00000  0.00000 119.80000  3.40500  0.00000  "
           "0.00000\nEND\n")
H2_LINE = ("ATOM      1 H2   H2  M    1      0.000   0.000   0.000 "
           "2.01600  0.00000  0.00000 34.20000  2.96000  0.00000  "
           "0.00000\nEND\n")
CO2_LINES = (
    "ATOM      1 CC   CO2 M    1      0.000   0.000   0.000 12.01100  "
    "0.65120  1.22810  8.52000  3.05500  0.00000  0.00000\n"
    "ATOM      2 OC   CO2 M    1      1.162   0.000   0.000 15.99900 "
    "-0.32560  0.73950 76.76000  2.99000  0.00000  0.00000\n"
    "ATOM      3 OC   CO2 M    1     -1.162   0.000   0.000 15.99900 "
    "-0.32560  0.73950 76.76000  2.99000  0.00000  0.00000\nEND\n")


def _echo(sim, n_systems=1):
    buf = io.StringIO()
    buf.write("SIM_CONTROL: running parameters found in: run.in\n")
    buf.write("SIM_CONTROL: Finished reading config file.\n")
    display_sim_control(sim.cfg, out=buf, n_systems=n_systems)
    return buf.getvalue().splitlines()


def _fixture(name):
    with open(os.path.join(FIX, name)) as f:
        return f.read().splitlines()


class TestSimControlEcho:
    def test_npt_argon(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        with open("run.in", "w") as f:
            f.write(open(os.path.join(REPO, "examples", "npt-argon",
                                      "run.in")).read())
        open("argon.pqr", "w").write(AR_LINE)
        from mpmcxx_tpu.runner import Simulation
        sim = Simulation(read_config("run.in"), quiet=True)
        assert _echo(sim) == _fixture("npt_argon.txt")

    def test_gcmc_mof_h2(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        src = open(os.path.join(REPO, "examples", "gcmc-mof-h2",
                                "run.in")).read()
        open("run.in", "w").write(src)
        open("mof_h2.pqr", "w").write(H2_LINE)
        from mpmcxx_tpu.runner import Simulation
        sim = Simulation(read_config("run.in"), quiet=True)
        assert _echo(sim) == _fixture("gcmc_mof_h2.txt")

    def test_gcmc_mof_co2(self, tmp_path, monkeypatch):
        """Multi-site CO2 example (fixture captured from the reference
        binary on this run.in minus the polar_mixed extension keyword,
        which the reference does not know; our echo does not print it)."""
        monkeypatch.chdir(tmp_path)
        src = open(os.path.join(REPO, "examples", "gcmc-mof-co2",
                                "run.in")).read()
        open("run.in", "w").write(src)
        open("mof_co2.pqr", "w").write(CO2_LINES)
        from mpmcxx_tpu.runner import Simulation
        sim = Simulation(read_config("run.in"), quiet=True)
        assert _echo(sim) == _fixture("gcmc_mof_co2.txt")

    def test_gcmc_mof_mixture(self, tmp_path, monkeypatch):
        """Two-species CO2+H2 mixture with user_fugacities (fixture
        captured from the reference binary on this run.in minus the
        polar_mixed extension keyword, as for the CO2 example)."""
        monkeypatch.chdir(tmp_path)
        src = open(os.path.join(REPO, "examples", "gcmc-mof-mixture",
                                "run.in")).read()
        open("run.in", "w").write(src)
        open("mof_mix.pqr", "w").write(open(os.path.join(
            REPO, "examples", "gcmc-mof-mixture", "mof_mix.pqr")).read())
        from mpmcxx_tpu.runner import Simulation
        sim = Simulation(read_config("run.in"), quiet=True)
        assert _echo(sim) == _fixture("gcmc_mof_mixture.txt")

    def test_gibbs_argon(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        src = open(os.path.join(REPO, "examples", "gibbs-argon",
                                "run.in")).read()
        open("run.in", "w").write(src)
        open("boxA.pqr", "w").write(AR_LINE)
        open("boxB.pqr", "w").write(AR_LINE)
        from mpmcxx_tpu.mc.gibbs import GibbsSimulation
        sim = GibbsSimulation(read_config("run.in"), quiet=True)
        assert _echo(sim, n_systems=2) == _fixture("gibbs_argon.txt")

    def test_pi_argon_dimer(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        src = open(os.path.join(REPO, "examples", "pi-argon-dimer",
                                "run.in")).read()
        src = src.replace("numsteps 3000", "numsteps 2")
        src = src.replace("corrtime 300", "corrtime 1")
        open("run.in", "w").write(src)
        open("dimer.pqr", "w").write(open(os.path.join(
            REPO, "examples", "pi-argon-dimer", "dimer.pqr")).read())
        from mpmcxx_tpu.mc.pi import PISimulation
        sim = PISimulation(read_config("run.in"), P=4, quiet=True)
        assert _echo(sim, n_systems=4) == _fixture("pi_argon_dimer.txt")
