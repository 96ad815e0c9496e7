"""Coupled-dipole ("polarvdw") many-body van der Waals energy.

The reference computes vdW energy from eigenvalues of the mass-weighted
Thole matrix C = K^-1/2 A K^-1/2 (src/System.Energy.cpp:175-753).  Its
LAPACK dsyev_ calls are commented out (:566,571) — the reference path
returns garbage; here ``jnp.linalg.eigvalsh`` restores the physics on TPU.

E = (sum_i sqrt(lambda_i) [C]  -  sum_i sqrt(lambda_i) [C_iso]) * au->K
where C_iso zeroes all inter-molecular blocks, so its spectrum is the union
of the per-molecule isolated spectra (replacing the reference's per-type
e_iso cache, :255-307).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const
from ..flags import FFlags, RunParams
from ..state import SystemState
from .linalg import eigvalsh as sym_eigvalsh
from .pairwise import PairTensors
from .pair_potentials import _reduced_mass_kg, _safe_div


def _sqrtkinv(state: SystemState):
    """sqrt(alpha_i)*omega_i per atom; zero kills the row/col
    (src/System.Energy.cpp:231-251)."""
    k = jnp.sqrt(jnp.abs(state.polarizability)) * state.omega
    return jnp.where(state.atom_alive(), k, 0.0)


def _cmatrix(state: SystemState, Amat, intra_only: bool):
    """[3A,3A] C matrix; zero rows/cols where sqrtKinv==0 (their eigenvalues
    become 0 and contribute nothing to sum sqrt(lambda))."""
    A = state.n_atom_slots
    k = _sqrtkinv(state)
    blocks = Amat * (k[:, None] * k[None, :])[:, :, None, None]
    if intra_only:
        same = state.mol_id[:, None] == state.mol_id[None, :]
        blocks = blocks * same[:, :, None, None]
    return jnp.transpose(blocks, (0, 2, 1, 3)).reshape(3 * A, 3 * A)


def _eigen_energy(C):
    lam = sym_eigvalsh(C)
    lam = jnp.where(lam < 0.0, 0.0, lam)
    return jnp.sum(jnp.sqrt(lam))


def e2body(state: SystemState, pt: PairTensors, params: RunParams, r):
    """Two-body coupled-dipole energy at separation ``r`` [A,A].

    The reference's 6x6 eigproblem (src/System.Energy.cpp:498-536)
    decouples into three 2x2 blocks (one per axis), solved here in closed
    form.
    """
    l = params.polar_damp
    lr = l * r
    elr = jnp.exp(-lr)
    r3 = jnp.where(r == 0.0, 1.0, r) ** 3
    Txx = (-2.0 + (0.5 * lr ** 3 + lr ** 2 + 2 * lr + 2) * elr) / r3
    Tyy = (1.0 - (0.5 * lr ** 2 + lr + 1) * elr) / r3
    wi = state.omega[:, None]
    wj = state.omega[None, :]
    coupling = (wi * wj *
                jnp.sqrt(jnp.abs(state.polarizability[:, None] *
                                 state.polarizability[None, :])))

    def axis_sum(T):
        c = coupling * T
        p, q = wi ** 2, wj ** 2
        disc = jnp.sqrt(jnp.maximum((p - q) ** 2 + 4.0 * c * c, 0.0))
        lam1 = jnp.maximum(0.5 * (p + q + disc), 0.0)
        lam2 = jnp.maximum(0.5 * (p + q - disc), 0.0)
        return jnp.sqrt(lam1) + jnp.sqrt(lam2)

    total = axis_sum(Txx) + 2.0 * axis_sum(Tyy)
    total = total - 3.0 * wi - 3.0 * wj
    return total * const.au2invseconds * const.half_hBar


def fh_vdw_corr(state: SystemState, pt: PairTensors, flags: FFlags,
                params: RunParams):
    """FH correction by 5-point finite differencing of e2body
    (src/System.Energy.cpp:630-689)."""
    H = 0.01
    mask = (pt.pair_once & pt.alive & ~pt.frozen & ~pt.same_mol &
            ~(pt.rimg > state.pbc.cutoff) &
            (state.polarizability[:, None] != 0.0) &
            (state.polarizability[None, :] != 0.0) &
            (state.omega[:, None] != 0.0) & (state.omega[None, :] != 0.0))
    r = pt.rimg
    E = [e2body(state, pt, params, r + dh)
         for dh in (-2 * H, -H, 0.0, H, 2 * H)]
    dv = (E[3] - E[1]) / (2.0 * H)
    d2v = (E[3] - 2.0 * E[2] + E[1]) / (H * H)
    d3v = (E[4] - 2 * E[3] + 2 * E[1] - E[0]) / (2 * H ** 3)
    d4v = (E[4] - 4 * E[3] + 6 * E[2] - 4 * E[1] + E[0]) / H ** 4
    rm = _reduced_mass_kg(state, pt)
    T = params.temperature
    rs = jnp.where(r == 0.0, 1.0, r)
    corr = (const.METER2ANGSTROM ** 2 *
            (const.hBar * const.hBar / (24.0 * const.kB * T * rm)) *
            (d2v + 2.0 * dv / rs))
    if flags.feynman_hibbs_order >= 4:
        corr += (const.METER2ANGSTROM ** 4 *
                 (const.hBar ** 4 / (1152.0 * (const.kB * T * rm) ** 2)) *
                 (15.0 * dv / rs ** 3 + 4.0 * d3v / rs + d4v))
    return jnp.sum(jnp.where(mask, corr, 0.0))


def fh_vdw_corr_2be(state: SystemState, pt: PairTensors, flags: FFlags,
                    params: RunParams):
    """FH via analytic C6 derivatives (src/System.Energy.cpp:693-753)."""
    a_i = state.polarizability[:, None]
    a_j = state.polarizability[None, :]
    w_i = state.omega[:, None]
    w_j = state.omega[None, :]
    mask = (pt.pair_once & pt.alive & ~pt.frozen & ~pt.same_mol &
            ~(pt.rimg > state.pbc.cutoff) &
            (a_i != 0.0) & (a_j != 0.0) & (w_i != 0.0) & (w_j != 0.0))
    cC = (1.5 * const.c_hBar * _safe_div(w_i * w_j, w_i + w_j) *
          const.au2invseconds * a_i * a_j)
    rm = _reduced_mass_kg(state, pt)
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    T = params.temperature
    dv = 6.0 * cC * r ** (-7.0)
    d2v = dv * (-7.0) / r
    corr = (const.METER2ANGSTROM ** 2 *
            (const.hBar * const.hBar / (24.0 * const.kB * T * rm)) *
            (d2v + 2.0 * dv / r))
    if flags.feynman_hibbs_order >= 4:
        d3v = d2v * (-8.0) / r
        d4v = d3v * (-9.0) / r
        corr += (const.METER2ANGSTROM ** 4 *
                 (const.hBar ** 4 / (1152.0 * (const.kB * T * rm) ** 2)) *
                 (15.0 * dv / r ** 3 + 4.0 * d3v / r + d4v))
    return jnp.sum(jnp.where(mask, corr, 0.0))


def lr_vdw_corr(state: SystemState, pt: PairTensors, params: RunParams):
    """Long-range correction (src/System.Energy.cpp:586-626); same-molecule
    pairs DO contribute (reference comment at :608)."""
    a_i = state.polarizability[:, None]
    a_j = state.polarizability[None, :]
    w_i = state.omega[:, None]
    w_j = state.omega[None, :]
    mask = (pt.pair_once & pt.alive & ~pt.frozen &
            (a_i != 0.0) & (a_j != 0.0) & (w_i != 0.0) & (w_j != 0.0))
    cC = (1.5 * const.c_hBar * _safe_div(w_i * w_j, w_i + w_j) *
          const.au2invseconds * a_i * a_j)
    corr = -4.0 / 3.0 * const.pi * cC * state.pbc.cutoff ** (-3.0) / \
        state.pbc.volume
    return jnp.sum(jnp.where(mask, corr, 0.0))


def vdw(state: SystemState, Amat, pt: PairTensors, flags: FFlags,
        params: RunParams):
    """Total coupled-dipole vdW energy (src/System.Energy.cpp:175-227)."""
    C = _cmatrix(state, Amat, intra_only=False)
    C_iso = _cmatrix(state, Amat, intra_only=True)
    e_total = _eigen_energy(C) * const.au2invseconds * const.half_hBar
    e_iso = _eigen_energy(C_iso) * const.au2invseconds * const.half_hBar

    if flags.feynman_hibbs:
        fh = (fh_vdw_corr_2be(state, pt, flags, params) if flags.vdw_fh_2be
              else fh_vdw_corr(state, pt, flags, params))
    else:
        fh = 0.0
    lr = lr_vdw_corr(state, pt, params) if flags.rd_lrc else 0.0
    return e_total - e_iso + fh + lr
