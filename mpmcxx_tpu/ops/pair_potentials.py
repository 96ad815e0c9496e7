"""Repulsion/dispersion pair potentials.

Dense masked implementations of the reference's RD kernels:
  * Lennard-Jones + LRC + crystal lattice sums + Feynman-Hibbs
    (src/System.Energy.cpp:897-1208)
  * buffered 14-7 MMFF (src/System.Energy.cpp:1212-1291)
  * Silvera-Goldman H2 (src/System.Energy.cpp:1773-1928)
  * DREIDING (src/System.Energy.cpp:2098-2265)
  * dispersion expansion with Tang-Toennies damping
    (src/System.Energy.cpp:1939-2078)
  * exponential repulsion (src/System.Energy.cpp:2275-2485)
  * 1-D anharmonic oscillator + Feynman-Kleinert/FH
    (src/System.Energy.cpp:757-885)

Each returns total energy in Kelvin.  The reference's per-pair
``recalculate_energy`` caching (src/System.cpp:1202-1279) is dropped: on TPU
the full masked recompute is one fused elementwise pass over [A,A] tiles.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..flags import FFlags, RunParams
from ..state import SystemState
from .pairwise import PairTensors


def _safe_div(a, b):
    return a / jnp.where(b == 0.0, 1.0, b)


def _reduced_mass_kg(state: SystemState, pt=None):
    """Pair reduced mass in kg from molecule masses ([R,A] layout)."""
    mm = state.mol_mass[state.mol_id]
    mi = (pt.row(mm) if pt is not None else mm)[:, None]
    mj = mm[None, :]
    return const.AMU2KG * _safe_div(mi * mj, mi + mj)


def _crystal_images(rd_crystal_order: int, include_origin: bool):
    """Static lattice of cell-image coefficients for rd_crystal sums."""
    n = rd_crystal_order - 1
    rng = np.arange(-n, n + 1)
    g = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    if not include_origin:
        g = g[np.any(g != 0, axis=1)]
    return jnp.asarray(g, dtype=jnp.float64)


def lj_fh_corr(flags: FFlags, params: RunParams, state: SystemState,
               rimg, term12, term6, epsilon, sigrep, pt=None):
    """Feynman-Hibbs 2nd/4th order LJ correction
    (src/System.Energy.cpp:1100-1148)."""
    ir = _safe_div(1.0, rimg)
    ir2, ir3, ir4 = ir * ir, ir ** 3, ir ** 4
    rm = _reduced_mass_kg(state, pt)
    T = params.temperature
    if flags.cdvdw_sig_repulsion:
        dE = -6.0 * sigrep * (2.0 * term12 - term6) * ir
        d2E = 6.0 * sigrep * (26.0 * term12 - 7.0 * term6) * ir2
    else:
        dE = -24.0 * epsilon * (2.0 * term12 - term6) * ir
        d2E = 24.0 * epsilon * (26.0 * term12 - 7.0 * term6) * ir2
    corr = (const.M2A2 * (const.hBar2 / (24.0 * const.kB * T * rm)) *
            (d2E + 2.0 * dE * ir))
    if flags.feynman_hibbs_order >= 4:
        if flags.cdvdw_sig_repulsion:
            d3E = -336.0 * sigrep * (6.0 * term12 - term6) * ir3
            d4E = 3024.0 * sigrep * (10.0 * term12 - term6) * ir4
        else:
            d3E = -1344.0 * epsilon * (6.0 * term12 - term6) * ir3
            d4E = 12096.0 * epsilon * (10.0 * term12 - term6) * ir4
        corr += (const.M2A4 *
                 (const.hBar4 / (1152.0 * const.kB2 * T * T * rm * rm)) *
                 (15.0 * dE * ir3 + 4.0 * d3E * ir + d4E))
    return corr


def lj(state: SystemState, pt: PairTensors, flags: FFlags,
       params: RunParams, pair_only: bool = False) -> jnp.ndarray:
    """Lennard-Jones energy (src/System.Energy.cpp:897-1032)."""
    if flags.rd_crystal:
        cutoff = 2.0 * state.pbc.cutoff * (flags.rd_crystal_order - 0.5)
    else:
        cutoff = state.pbc.cutoff

    base = pt.pair_once & pt.alive
    contrib = (base & (pt.rimg - const.SMALL_dR < cutoff) &
               (~pt.rd_excluded | bool(flags.rd_crystal)) & ~pt.frozen)

    abs_sig = jnp.abs(pt.sigma)
    if flags.rd_crystal:
        imgs = _crystal_images(flags.rd_crystal_order, include_origin=True)
        shift = imgs @ state.pbc.basis              # [C,3]
        dd = pt.dimg * 0 + (state.pos[:, None, :] - state.pos[None, :, :])
        rvec = dd[None, :, :, :] + shift[:, None, None, :]   # [C,A,A,3]
        rr = jnp.linalg.norm(rvec, axis=-1)
        origin = jnp.all(imgs == 0, axis=-1)[:, None, None]
        use = (rr <= cutoff) & ~(origin & pt.rd_excluded[None]) & (rr > 0)
        sor = jnp.where(use, _safe_div(abs_sig[None], rr), 0.0)
        sor6 = jnp.sum(sor ** 6, axis=0)
        sor12 = jnp.sum(sor ** 12, axis=0)
    else:
        sor = _safe_div(abs_sig, pt.rimg)
        sor6 = sor ** 6
        sor12 = sor6 * sor6

    if flags.spectre:
        term6 = jnp.zeros_like(sor6)
        term12 = sor12
        pot = term12
    else:
        term6 = jnp.zeros_like(sor6) if flags.polarvdw else sor6
        term12 = jnp.where(pt.attractive_only, 0.0, sor12)
        if flags.cdvdw_sig_repulsion:
            pot = pt.sigrep * term12
        else:
            pot = 4.0 * pt.epsilon * (term12 - term6)

    if flags.feynman_hibbs:
        pot = pot + lj_fh_corr(flags, params, state, pt.rimg, term12, term6,
                               pt.epsilon, pt.sigrep, pt)

    if flags.cavity_autoreject:
        pot = jnp.where(pt.rimg < params.cavity_autoreject_scale * abs_sig,
                        const.MAXVALUE, pot)

    energy = jnp.sum(jnp.where(contrib, pot, 0.0))

    if flags.rd_lrc:
        energy += lj_lrc(state, pt, flags, cutoff, pair_only=pair_only)

    if flags.rd_crystal and not pair_only:
        energy += lj_rd_crystal_self(state, flags, cutoff)

    return energy


def lj_lrc(state: SystemState, pt: PairTensors, flags: FFlags, cutoff,
           pair_only: bool = False):
    """Pair + self long-range corrections (src/System.Energy.cpp:1036-1096)."""
    vol = state.pbc.volume
    # pair LRC: every alive, non-frozen pair with nonzero mixed eps&sigma;
    # rd-excluded (same molecule) pairs DO contribute (reference comment).
    sp = state.spectre
    ss_pair = pt.row(sp)[:, None] & sp[None, :]
    ok = (pt.pair_once & pt.alive & ~pt.frozen & ~ss_pair &
          (pt.epsilon != 0.0) & (pt.sigma != 0.0))
    sig_cut = jnp.abs(pt.sigma) / cutoff
    sig3 = jnp.abs(pt.sigma) ** 3
    sig_cut3 = sig_cut ** 3
    sig_cut9 = sig_cut3 ** 3
    if flags.cdvdw_sig_repulsion:
        pair_lrc = (4.0 / 9.0) * const.pi * pt.sigrep * sig3 * sig_cut9 / vol
    elif flags.polarvdw:
        pair_lrc = (16.0 / 9.0) * const.pi * pt.epsilon * sig3 * sig_cut9 / vol
    else:
        pair_lrc = ((16.0 / 3.0) * const.pi * pt.epsilon * sig3 *
                    ((1.0 / 3.0) * sig_cut9 - sig_cut3) / vol)
    total = jnp.sum(jnp.where(ok, pair_lrc, 0.0))
    if pair_only:
        return total

    # self LRC per alive atom
    aok = (state.atom_alive() & (state.sigma != 0.0) & (state.epsilon != 0.0)
           & ~state.frozen & ~state.spectre)
    s_cut = jnp.abs(state.sigma) / cutoff
    s3 = jnp.abs(state.sigma) ** 3
    s_cut3 = s_cut ** 3
    s_cut9 = s_cut3 ** 3
    if flags.cdvdw_sig_repulsion:
        self_lrc = ((1.0 / 3.0) * const.pi * const.hBar / const.kB *
                    const.au2invseconds * state.omega *
                    state.polarizability ** 2 * _safe_div(s_cut9, s3) / vol)
    elif flags.polarvdw:
        self_lrc = (16.0 / 9.0) * const.pi * state.epsilon * s3 * s_cut9 / vol
    else:
        self_lrc = ((16.0 / 3.0) * const.pi * state.epsilon * s3 *
                    ((1.0 / 3.0) * s_cut9 - s_cut3) / vol)
    total += jnp.sum(jnp.where(aok, self_lrc, 0.0))
    return total


def lj_rd_crystal_self(state: SystemState, flags: FFlags, cutoff):
    """Self-interaction with periodic images (src/System.Energy.cpp:1152-1208)."""
    imgs = _crystal_images(flags.rd_crystal_order, include_origin=False)
    shift = imgs @ state.pbc.basis                       # [C,3]
    rr = jnp.linalg.norm(shift, axis=-1)                 # [C]
    use = (rr <= cutoff)
    abs_sig = jnp.abs(state.sigma)                       # [A]
    sor = jnp.where(use[:, None], _safe_div(abs_sig[None, :], rr[:, None]), 0.0)
    sor6 = 0.5 * jnp.sum(sor ** 6, axis=0)
    sor12 = 0.5 * jnp.sum(sor ** 12, axis=0)
    if flags.spectre:
        pot = sor12
    else:
        term6 = jnp.zeros_like(sor6) if flags.polarvdw else sor6
        term12 = jnp.where(state.sigma < 0.0, 0.0, sor12)
        if flags.cdvdw_sig_repulsion:
            pot = (0.75 * const.hBar / const.kB * const.au2invseconds *
                   state.omega * state.polarizability ** 2 *
                   _safe_div(term12, state.sigma ** 6))
        elif flags.polarvdw:
            pot = 4.0 * state.epsilon * term12
        else:
            pot = 4.0 * state.epsilon * (term12 - term6)
    ok = state.atom_alive() & ~((state.sigma == 0.0) & (state.epsilon == 0.0))
    return jnp.sum(jnp.where(ok, pot, 0.0))


def lj_buffered_14_7(state: SystemState, pt: PairTensors, flags: FFlags,
                     params: RunParams):
    """Buffered 14-7 MMFF potential (src/System.Energy.cpp:1212-1248)."""
    ok = (pt.pair_once & pt.alive & ~(pt.rimg > state.pbc.cutoff) &
          ~pt.rd_excluded & ~pt.frozen)
    r_sig = _safe_div(pt.rimg, pt.sigma)
    first = (1.07 / (r_sig + 0.07)) ** 7
    second = 1.12 / (r_sig ** 7 + 0.12) - 2.0
    pot = pt.epsilon * first * second
    if flags.cavity_autoreject:
        pot = jnp.where(pt.rimg < params.cavity_autoreject_scale * pt.sigma,
                        const.MAXVALUE, pot)
    return jnp.sum(jnp.where(ok, pot, 0.0))


# Silvera-Goldman constants (src/System.Energy.cpp:1763-1770)
SG_ALPHA, SG_BETA, SG_GAMMA = 1.713, 1.5671, 0.00993
SG_C6, SG_C8, SG_C10, SG_C9, SG_RM = 12.14, 215.2, 4813.9, 143.1, 8.321


def sg(state: SystemState, pt: PairTensors, flags: FFlags, params: RunParams):
    """Silvera-Goldman H2 potential (src/System.Energy.cpp:1773-1867).

    Note the reference applies SG to every pair within the cutoff, with no
    exclusion/frozen checks in the inner condition.
    """
    ok = pt.pair_once & pt.alive & (pt.rimg < state.pbc.cutoff)
    r = pt.rimg / const.AU2ANGSTROM
    r = jnp.where(r == 0.0, 1.0, r)
    repulsive = jnp.exp(SG_ALPHA - SG_BETA * r - SG_GAMMA * r * r)
    multipole = (SG_C6 / r ** 6 + SG_C8 / r ** 8 + SG_C10 / r ** 10 -
                 SG_C9 / r ** 9)
    r_rm = SG_RM / r
    expterm = jnp.where(r < SG_RM, jnp.exp(-((r_rm - 1.0) ** 2)), 1.0)
    pot = repulsive - multipole * expterm

    if flags.feynman_hibbs:
        first = (-SG_BETA - 2.0 * SG_GAMMA * r) * repulsive
        first += (6.0 * SG_C6 / r ** 7 + 8.0 * SG_C8 / r ** 9 -
                  9.0 * SG_C9 / r ** 10 + 10.0 * SG_C10 / r ** 11) * expterm
        frd = (r_rm * r_rm - r_rm) / r
        first += -2.0 * multipole * expterm * frd
        second = ((SG_BETA + 2.0 * SG_GAMMA * r) ** 2 - 2.0 * SG_GAMMA) * repulsive
        second += (-expterm) * (42.0 * SG_C6 / r ** 8 + 72.0 * SG_C8 / r ** 10 -
                                90.0 * SG_C9 / r ** 11 + 110.0 * SG_C10 / r ** 10)
        second += expterm * frd * (12.0 * SG_C6 / r ** 7 + 16.0 * SG_C8 / r ** 9 -
                                   18.0 * SG_C9 / r ** 10 + 20.0 * SG_C10 / r ** 11)
        second += expterm * frd ** 2 * 4.0 * multipole
        srd = (3.0 * r_rm * r_rm - 2.0 * r_rm) / (r * r)
        second += expterm * srd * 2.0 * multipole
        mmass = const.AMU2KG * pt.row(state.mol_mass[state.mol_id])[:, None]
        fh2 = (const.M2A2 * (const.hBar ** 2 /
               (24.0 * const.kB * params.temperature * mmass)) *
               (second + 2.0 * first / r))
        pot = pot + fh2
    return jnp.sum(jnp.where(ok, pot * const.HARTREE2KELVIN, 0.0))


DREIDING_GAMMA = 12.0


def dreiding(state: SystemState, pt: PairTensors, flags: FFlags,
             params: RunParams):
    """DREIDING exp-6 potential (src/System.Energy.cpp:2098-2215)."""
    g = DREIDING_GAMMA
    ok = (pt.pair_once & pt.alive & ~(pt.rimg > state.pbc.cutoff) &
          ~pt.rd_excluded & ~pt.frozen)
    r_sig = _safe_div(pt.rimg, pt.sigma)
    term6 = r_sig ** (-6.0) * (g / (g - 6.0))
    termexp = jnp.where(
        pt.attractive_only, 0.0,
        jnp.where(pt.rimg < 0.4 * pt.sigma, const.MAXVALUE,
                  jnp.exp(g * (1.0 - r_sig)) * (6.0 / (g - 6.0))))
    pot = pt.epsilon * (termexp - term6)
    if flags.cavity_autoreject:
        pot = jnp.where(pt.rimg < params.cavity_autoreject_scale * pt.sigma,
                        const.MAXVALUE, pot)
    return jnp.sum(jnp.where(ok, pot, 0.0))


def tt_damping(n: int, br):
    """Tang-Toennies damping f_n(br) (src/System.Energy.cpp:2037-2052)."""
    s = jnp.ones_like(br)
    term = jnp.ones_like(br)
    for i in range(1, n + 1):
        term = term * br / i
        s = s + term
    result = 1.0 - jnp.exp(-br) * s
    return jnp.where(result > 1e-9, result, 0.0)


def disp_expansion(state: SystemState, pt: PairTensors, flags: FFlags,
                   params: RunParams, pair_only: bool = False):
    """C6/C8/C10 dispersion + Born-Mayer repulsion
    (src/System.Energy.cpp:1939-2018).  The mbvdw coupling term is applied in
    the energy dispatcher."""
    ok = pt.pair_once & pt.alive & ~pt.rd_excluded & ~pt.frozen
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    r2 = r * r
    r6 = r2 ** 3
    r8 = r6 * r2
    r10 = r8 * r2
    c6 = jnp.zeros_like(pt.c6) if flags.disp_expansion_mbvdw else pt.c6
    repulsion = jnp.where(
        (pt.epsilon != 0.0) & (pt.sigma != 0.0),
        315.7750382111558307123944638 * jnp.exp(-pt.epsilon * (r - pt.sigma)),
        0.0)
    if flags.damp_dispersion:
        pot = (-tt_damping(6, pt.epsilon * r) * c6 / r6
               - tt_damping(8, pt.epsilon * r) * pt.c8 / r8
               - tt_damping(10, pt.epsilon * r) * pt.c10 / r10 + repulsion)
    else:
        pot = -c6 / r6 - pt.c8 / r8 - pt.c10 / r10 + repulsion
    if flags.cavity_autoreject:
        pot = jnp.where(pt.rimg < params.cavity_autoreject_scale * pt.sigma,
                        const.MAXVALUE, pot)
        pot = jnp.where((params.cavity_autoreject_repulsion != 0.0) &
                        (repulsion > params.cavity_autoreject_repulsion),
                        const.MAXVALUE, pot)
    energy = jnp.sum(jnp.where(ok, pot, 0.0))

    if flags.rd_lrc:
        cutoff = state.pbc.cutoff
        vol = state.pbc.volume
        lrc_ok = pt.pair_once & pt.alive & ~pt.frozen
        pair_lrc = -4.0 * const.pi * (
            pt.c6 / (3.0 * cutoff ** 3) + pt.c8 / (5.0 * cutoff ** 5) +
            pt.c10 / (7.0 * cutoff ** 7)) / vol
        energy += jnp.sum(jnp.where(lrc_ok, pair_lrc, 0.0))
        if pair_only:
            return energy
        # self LRC (src/System.Energy.cpp:2056-2078) — uses *unmixed* atomic
        # coefficients in a.u.; reference uses atom_ptr->c6 directly.
        if flags.extrapolate_disp_coeffs:
            c10s = jnp.where((state.c6 != 0.0) & (state.c8 != 0.0),
                             49.0 / 40.0 * state.c8 ** 2 /
                             jnp.where(state.c6 == 0, 1.0, state.c6), 0.0)
        else:
            c10s = state.c10
        self_lrc = -4.0 * const.pi * (
            state.c6 / (3.0 * cutoff ** 3) + state.c8 / (5.0 * cutoff ** 5) +
            c10s / (7.0 * cutoff ** 7)) / vol
        energy += jnp.sum(jnp.where(state.atom_alive() & ~state.frozen,
                                    self_lrc, 0.0))
    return energy


def exp_fh_corr(flags, params, state, rimg, epsilon, pot, pt=None):
    """FH correction for exp repulsion (src/System.Energy.cpp:2400-2437)."""
    ir = _safe_div(1.0, rimg)
    ir3 = ir ** 3
    rm = _reduced_mass_kg(state, pt)
    dE = -pot / (2.0 * jnp.where(epsilon == 0, 1.0, epsilon))
    d2E = dE / (2.0 * jnp.where(epsilon == 0, 1.0, epsilon))
    corr = (const.M2A2 * (const.hBar2 /
            (24.0 * const.kB * params.temperature * rm)) * (d2E + 2.0 * dE * ir))
    if flags.feynman_hibbs_order >= 4:
        d3E = -d2E / (2.0 * jnp.where(epsilon == 0, 1.0, epsilon))
        d4E = d3E / (2.0 * jnp.where(epsilon == 0, 1.0, epsilon))
        corr += (const.M2A4 * (const.hBar4 /
                 (1152.0 * const.kB2 * params.temperature ** 2 * rm * rm)) *
                 (15.0 * dE * ir3 + 4.0 * d3E * ir + d4E))
    return corr


def exp_repulsion(state: SystemState, pt: PairTensors, flags: FFlags,
                  params: RunParams, pair_only: bool = False):
    """Buckingham exponential repulsion (src/System.Energy.cpp:2275-2368)."""
    if flags.rd_crystal:
        cutoff = 2.0 * state.pbc.cutoff * (flags.rd_crystal_order - 0.5)
    else:
        cutoff = state.pbc.cutoff
    ok = (pt.pair_once & pt.alive & (pt.rimg - const.SMALL_dR < cutoff) &
          (~pt.rd_excluded | bool(flags.rd_crystal)) & ~pt.frozen)
    eps = jnp.where(pt.epsilon == 0.0, 1.0, pt.epsilon)
    if flags.rd_crystal:
        # lattice sum, images in [-order, order] (note: wider than LJ's)
        n = flags.rd_crystal_order
        rng = np.arange(-n, n + 1)
        gi = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
        imgs = jnp.asarray(gi, dtype=jnp.float64)
        shift = imgs @ state.pbc.basis
        dd = state.pos[:, None, :] - state.pos[None, :, :]
        rvec = dd[None] + shift[:, None, None, :]
        rr = jnp.linalg.norm(rvec, axis=-1)
        origin = jnp.all(imgs == 0, axis=-1)[:, None, None]
        use = (rr + const.SMALL_dR <= cutoff) & ~(origin & pt.rd_excluded[None])
        term = jnp.sum(jnp.where(use, jnp.exp(-rr / (2.0 * eps[None])), 0.0),
                       axis=0)
    else:
        term = jnp.exp(-pt.rimg / (2.0 * eps))
    pot = pt.sigma * term
    if flags.feynman_hibbs:
        pot = pot + exp_fh_corr(flags, params, state, pt.rimg, pt.epsilon, pot, pt)
    energy = jnp.sum(jnp.where(ok, pot, 0.0))

    if flags.rd_crystal and not pair_only:
        # self term (src/System.Energy.cpp:2441-2469)
        n = flags.rd_crystal_order
        rng = np.arange(-n, n + 1)
        gi = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
        gi = gi[np.any(gi != 0, axis=1)]
        shift = jnp.asarray(gi, dtype=jnp.float64) @ state.pbc.basis
        rr = jnp.linalg.norm(shift, axis=-1)
        aeps = jnp.where(state.epsilon == 0.0, 1.0, state.epsilon)
        t = 0.5 * jnp.sum(jnp.where((rr <= cutoff)[:, None],
                                    jnp.exp(-rr[:, None] / (2.0 * aeps[None, :])),
                                    0.0), axis=0)
        aok = (state.atom_alive() & (state.sigma != 0.0) &
               (state.epsilon != 0.0))
        energy += jnp.sum(jnp.where(aok, state.sigma * t, 0.0))

    if flags.rd_lrc:
        vol = state.pbc.volume
        rover2e = cutoff / (2.0 * eps)
        sp = state.spectre
        ss_pair = sp[:, None] & sp[None, :]
        lrc_ok = (pt.pair_once & pt.alive & ~pt.frozen & ~ss_pair &
                  (pt.epsilon != 0.0) & (pt.sigma != 0.0))
        pair_lrc = ((8.0 * const.pi) * jnp.exp(1.0 - rover2e) *
                    (cutoff ** 2 + 4.0 * pt.epsilon * cutoff +
                     8.0 * pt.epsilon ** 2) * pt.sigma / vol)
        energy += jnp.sum(jnp.where(lrc_ok, pair_lrc, 0.0))
        if pair_only:
            return energy
        aeps = jnp.where(state.epsilon == 0.0, 1.0, state.epsilon)
        arover = cutoff / (2.0 * aeps)
        self_lrc = ((8.0 * const.pi) * jnp.exp(1.0 - arover) *
                    (cutoff ** 2 + 4.0 * state.epsilon * cutoff +
                     8.0 * state.epsilon ** 2) * state.sigma / vol)
        aok = (state.atom_alive() & (state.sigma != 0.0) &
               (state.epsilon != 0.0) & ~state.frozen & ~state.spectre)
        energy += jnp.sum(jnp.where(aok, self_lrc, 0.0))
    return energy


def anharmonic(state: SystemState, flags: FFlags, params: RunParams):
    """1-D anharmonic oscillator well (src/System.Energy.cpp:757-885)."""
    k = flags.rd_anharmonic_k
    g = flags.rd_anharmonic_g
    x = state.pos[:, 0]
    ok = state.atom_alive()
    pot = 0.5 * k * x ** 2 + 0.25 * g * x ** 4
    if flags.feynman_hibbs and not flags.feynman_kleinert:
        mass = const.AMU2KG * state.mass
        T = params.temperature
        first = k * x + g * x ** 3
        second = k + 3.0 * g * x ** 2
        xs = jnp.where(x == 0.0, 1.0, x)
        fh2 = (const.M2A2 * const.hBar ** 2 /
               (24.0 * const.kB * T * mass) * (second + 2.0 * first / xs))
        pot = pot + fh2
        if flags.feynman_hibbs_order == 4:
            other = 15.0 * k / xs ** 2 + 45.0 * g
            pot = pot + (const.M2A4 * const.hBar ** 4 /
                         (1152.0 * (const.kB * T * mass) ** 2) * other)
    return jnp.sum(jnp.where(ok, pot, 0.0))
