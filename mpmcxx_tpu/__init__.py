"""mpmcxx_tpu — a TPU-native Metropolis Monte Carlo framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MPMC++
(b-tudor/mpmcxx): NVT/uVT/NVE/NPT, Gibbs, and path-integral NVT ensembles
over LJ / Silvera-Goldman / dispersion-expansion / buffered-14-7 / DREIDING
force fields, Ewald & Wolf electrostatics, Thole polarization, coupled-dipole
vdW, fugacity equations of state, and the reference's input/output file
contract.
"""

import jax

# double precision is the fidelity contract with the reference C++ engine
jax.config.update("jax_enable_x64", True)

from . import constants  # noqa: E402
from .flags import FFlags, RunParams  # noqa: E402
from .pbc import PBC  # noqa: E402
from .state import Observables, SystemState, build_state  # noqa: E402

__version__ = "0.1.0"
