"""Byte-parity of the secondary output surfaces against
reference-binary-produced golden files.

The fixtures under tests/golden/io_surfaces/ were written by the ACTUAL
compiled reference engine (tools/io_parity.py --save-golden) on
deterministic ``move_factor 0`` runs — every displacement proposes a
zero translation, so the configuration never changes and the histogram
grids / SCF dipoles / fields are RNG-independent.  This replays OUR
engine on the identical inputs and diffs every line (byte-equal, or
numeric within the %f print quantum).

Covers: OpenDX population histogram (src/System.Histogram.cpp:213-259),
frozen-lattice wireframe (src/System.Output.cpp:85-244), per-molecule
dipole and field logs (src/System.Output.cpp:1131-1229).
"""

import os

import pytest

from tools import io_parity

GOLD = io_parity.GOLDEN_DIR


@pytest.mark.parametrize("scenario", list(io_parity.SCENARIOS))
def test_io_surfaces_match_reference(scenario, tmp_path):
    sc = io_parity.SCENARIOS[scenario]
    gold = os.path.join(GOLD, scenario)
    assert os.path.isdir(gold), (
        "golden io_surfaces fixtures missing; regenerate with "
        "python -m tools.io_parity --save-golden")
    d = str(tmp_path)
    io_parity._run("ours", d, io_parity._scenario_pqr(scenario),
                   sc["extra"], sc["steps"], sc["corrtime"])
    for fn in sc["files"]:
        assert io_parity.diff_file(fn, gold, d), fn
