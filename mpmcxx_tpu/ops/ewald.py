"""Electrostatic energy: Ewald, Wolf, and no-PBC Coulomb.

* real-space erfc sum with intra-molecular screening-charge correction
  (src/System.Energy.cpp:1466-1517)
* hemisphere k-space structure-factor sum (src/System.Energy.cpp:1561-1622)
  — here a batched cos/sin einsum over a static k-lattice
* self term (src/System.Energy.cpp:1626-1643)
* Wolf damped-shifted sum (src/System.Energy.cpp:1420-1462)
* no-PBC / GWP variants (src/System.Energy.cpp:1304-1392)

Charges are in reduced units sqrt(K*Angstrom); energies in Kelvin.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf, erfc

from .. import constants as const
from ..flags import FFlags, RunParams
from ..state import SystemState
from .pairwise import PairTensors, phase_dot
from .pair_potentials import _reduced_mass_kg, _safe_div


@lru_cache(maxsize=8)
def hemisphere_kvecs(kmax: int) -> np.ndarray:
    """Static integer k-lattice over the reference's hemisphere:
    l0 in [0,kmax]; l1 from 0 (if l0==0) else -kmax; l2 from 1 (if l0==l1==0)
    else -kmax; |l|^2 <= kmax^2 (src/System.Energy.cpp:1577-1583)."""
    out = []
    for l0 in range(0, kmax + 1):
        for l1 in range(0 if l0 == 0 else -kmax, kmax + 1):
            for l2 in range(1 if (l0 == 0 and l1 == 0) else -kmax, kmax + 1):
                if l0 * l0 + l1 * l1 + l2 * l2 > kmax * kmax:
                    continue
                out.append((l0, l1, l2))
    return np.asarray(out, dtype=np.float64)


def kvectors(state: SystemState, kmax: int):
    """[K,3] reciprocal vectors 2*pi * l @ recip.T and [K] k^2."""
    ls = jnp.asarray(hemisphere_kvecs(kmax))
    # size-3 contraction unrolled (serial while-loop lowering on TPU)
    k = 2.0 * const.pi * phase_dot(ls, state.pbc.reciprocal)
    k2 = jnp.sum(k * k, axis=-1)
    return k, k2


def coulombic_real_fh(flags: FFlags, params: RunParams, state: SystemState,
                      rimg, gaussian_term, erfc_term, pt=None):
    """FH correction for the real-space sum
    (src/System.Energy.cpp:1521-1557)."""
    alpha = params.ewald_alpha
    r = jnp.where(rimg == 0.0, 1.0, rimg)
    rr = r * r
    ir = 1.0 / r
    ir2, ir3, ir4 = ir * ir, ir ** 3, ir ** 4
    a2 = alpha * alpha
    a3 = a2 * alpha
    a4 = a3 * alpha
    rm = _reduced_mass_kg(state, pt)
    T = params.temperature
    du = -2.0 * alpha * gaussian_term / (r * jnp.sqrt(const.pi)) - erfc_term * ir2
    d2u = (4.0 / jnp.sqrt(const.pi)) * gaussian_term * (a3 + 1.0 * ir2) + \
        2.0 * erfc_term * ir3
    fh2 = (const.M2A2 * (const.hBar2 / (24.0 * const.kB * T * rm)) *
           (d2u + 2.0 * du / r))
    if flags.feynman_hibbs_order >= 4:
        d3u = (gaussian_term / jnp.sqrt(const.pi)) * (
            -8.0 * (a3 * a2) * r - 8.0 * a3 / r - 12.0 * alpha * ir3) - \
            6.0 * erfc_term * ir4
        d4u = (gaussian_term / jnp.sqrt(const.pi)) * (
            8.0 * a3 * a2 + 16.0 * a3 * a4 * rr + 32.0 * a3 * ir2 +
            48.0 * ir4) + 24.0 * erfc_term * (ir4 * ir)
        fh4 = (const.M2A4 *
               (const.hBar4 / (1152.0 * const.kB2 * T * T * rm * rm)) *
               (15.0 * du * ir3 + 4.0 * d3u / r + d4u))
    else:
        fh4 = 0.0
    return fh2 + fh4


def coulombic_real(state: SystemState, pt: PairTensors, flags: FFlags,
                   params: RunParams):
    """Real-space erfc sum minus intra-molecular screening correction."""
    alpha = params.ewald_alpha
    q_i, q_j = pt.row(state.charge)[:, None], state.charge[None, :]
    base = pt.pair_once & pt.alive & ~pt.frozen

    in_cut = ~(pt.rimg > state.pbc.cutoff) & ~pt.es_excluded
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    erfc_term = erfc(alpha * r)
    gaussian_term = jnp.exp(-alpha * alpha * r * r)
    pot = q_i * q_j * erfc_term / r
    if flags.feynman_hibbs:
        pot = pot + coulombic_real_fh(flags, params, state, pt.rimg,
                                      gaussian_term, erfc_term, pt)
    real = jnp.sum(jnp.where(base & in_cut, pot, 0.0))

    # screening-charge correction for excluded (same-molecule) pairs; uses
    # the real (unwrapped) distance r, not rimg (src/System.Energy.cpp:1504)
    rr = jnp.where(pt.r == 0.0, 1.0, pt.r)
    intra = q_i * q_j * erf(alpha * rr) / rr
    real -= jnp.sum(jnp.where(base & pt.es_excluded, intra, 0.0))
    return real


def coulombic_reciprocal(state: SystemState, flags: FFlags,
                         params: RunParams):
    """Hemisphere structure-factor sum as one batched einsum."""
    alpha = params.ewald_alpha
    k, k2 = kvectors(state, flags.ewald_kmax)
    q = jnp.where(state.atom_alive() & ~state.frozen, state.charge, 0.0)
    phase = phase_dot(state.pos, k)             # [A,K]
    sf_re = q @ jnp.cos(phase)                  # [K]
    sf_im = q @ jnp.sin(phase)
    pot = jnp.sum(jnp.exp(-k2 / (4.0 * alpha * alpha)) / k2 *
                  (sf_re ** 2 + sf_im ** 2))
    return pot * 4.0 * const.pi / state.pbc.volume


def coulombic_self(state: SystemState, params: RunParams):
    alpha = params.ewald_alpha
    ok = state.atom_alive() & ~state.frozen
    return -jnp.sum(jnp.where(ok, alpha * state.charge ** 2 /
                              jnp.sqrt(const.pi), 0.0))


def coulombic_wolf(state: SystemState, pt: PairTensors, flags: FFlags,
                   params: RunParams):
    """Wolf damped-shifted direct sum (src/System.Energy.cpp:1420-1462)."""
    alpha = params.ewald_alpha
    R = state.pbc.cutoff
    iR = 1.0 / R
    erfaRoverR = erf(alpha * R) / R
    ok = (pt.pair_once & pt.alive & ~pt.frozen & ~pt.es_excluded &
          (pt.rimg < R))
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    q_i, q_j = pt.row(state.charge)[:, None], state.charge[None, :]
    pot = q_i * q_j * (1.0 / r - erfaRoverR - iR * iR * (R - r))
    return jnp.sum(jnp.where(ok, pot, 0.0))


def coulombic_nopbc(state: SystemState, pt: PairTensors):
    """Plain Coulomb, no PBC (src/System.Energy.cpp:1304-1326)."""
    ok = pt.pair_once & pt.alive & ~pt.es_excluded
    r = jnp.where(pt.r == 0.0, 1.0, pt.r)
    q_i, q_j = pt.row(state.charge)[:, None], state.charge[None, :]
    return jnp.sum(jnp.where(ok, q_i * q_j / r, 0.0))


def coulombic_nopbc_gwp(state: SystemState, pt: PairTensors):
    """Gaussian-wave-packet Coulomb (src/System.Energy.cpp:1330-1367).

    Note: the reference applies this to every pair with no exclusion check.
    """
    ok = pt.pair_once & pt.alive
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    q_i, q_j = pt.row(state.charge)[:, None], state.charge[None, :]
    ai, aj = state.gwp_alpha[:, None], state.gwp_alpha[None, :]
    spin = state.gwp_spin[:, None] | state.gwp_spin[None, :]
    pe_gwp = q_i * q_j * erf(jnp.sqrt(1.5 * (ai * ai + aj * aj)) * r) / r
    pe = jnp.where(spin, pe_gwp, q_i * q_j / r)
    return jnp.sum(jnp.where(ok, pe, 0.0))


def coulombic_kinetic_gwp(state: SystemState):
    """GWP kinetic energy (src/System.Energy.cpp:1371-1392)."""
    ok = state.atom_alive() & state.gwp_spin
    ai = state.gwp_alpha / const.METER2ANGSTROM
    mass = const.AMU2KG * state.mass
    e = 9.0 * const.hBar ** 2 / (8.0 * ai * ai *
                                 jnp.where(mass == 0, 1.0, mass)) / const.kB
    return jnp.sum(jnp.where(ok, e, 0.0))


def coulombic(state: SystemState, pt: PairTensors, flags: FFlags,
              params: RunParams):
    """Total ES dispatcher (src/System.Energy.cpp:1396-1416)."""
    if flags.wolf:
        return coulombic_wolf(state, pt, flags, params)
    return (coulombic_real(state, pt, flags, params) +
            coulombic_reciprocal(state, flags, params) +
            coulombic_self(state, params))
