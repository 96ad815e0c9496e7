"""Thole dipole polarization.

Replaces the reference's polarization stack (src/System.Energy.cpp:2492-3761):

* A-matrix (dipole field tensor) with off/linear/exponential damping and
  optional wolf-full correction (thole_amatrix, :2661-2770) — stored as
  [A,A,3,3] blocks.
* static field via no-PBC / Wolf / Ewald (thole_field, :3271-3445)
* self-consistent solver: the reference's non-Gauss-Seidel path
  (thole_iterative, :3450-3543) maps to a Jacobi fixed-point iteration in a
  ``lax.while_loop`` (Gauss-Seidel is inherently sequential and would not
  vectorise; plain/SOR/ESOR iterations are reproduced exactly).
* exact matrix solve (thole_bmatrix/_dipoles, :3660-3710) via
  ``jnp.linalg.solve`` instead of LU inversion.
* full-Ewald SCF per Nymand & Linse (ewald_full, :2785-3143).  NOTE: the
  reference's induced_recip_term collapses the per-component k weight into a
  scalar (a loop bug at :3015-3016); we implement the correct vector weight.

Energy = -1/2 sum mu . E_static (+ Palmo correction) in Kelvin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfc

from .. import constants as const
from ..flags import FFlags, RunParams
from ..state import SystemState
from .pairwise import PairTensors, phase_dot
from .ewald import kvectors
from .linalg import solve_sym


class PolarResult(NamedTuple):
    energy: jnp.ndarray          # polarization energy (K)
    mu: jnp.ndarray              # [A,3] converged dipoles
    iterations: jnp.ndarray      # iteration count (float)
    iterator_failed: jnp.ndarray # bool
    dipole_rrms: jnp.ndarray     # mean dipole rrms


def thole_tile(state: SystemState, pt: PairTensors, flags: FFlags,
               params: RunParams):
    """Off-diagonal Thole dipole-tensor blocks for the pairs in ``pt``
    ([R,A,3,3]); shared by the dense A-matrix and the matrix-free blocked
    contraction (src/System.Energy.cpp:2694-2767)."""
    l = params.polar_damp
    rcut = state.pbc.cutoff
    r = pt.rimg
    r_safe = jnp.where(r == 0.0, 1.0, r)
    ir = 1.0 / r_safe
    ir3 = jnp.where(r == 0.0, const.MAXVALUE, ir ** 3)
    ir5 = jnp.where(r == 0.0, const.MAXVALUE, ir ** 5)

    if flags.damp_type == const.DAMPING_OFF:
        damp1 = jnp.where(pt.es_excluded, 0.0, 1.0)
        damp2 = damp1
        wdamp1 = damp1
        wdamp2 = damp1
    elif flags.damp_type == const.DAMPING_LINEAR:
        ai = state.polarizability[:, None] * state.polarizability[None, :]
        s = l * ai ** (1.0 / 6.0)
        v = r / jnp.where(s == 0.0, 1.0, s)
        damp1 = jnp.where(r < s, (4.0 - 3.0 * v) * v ** 3, 1.0)
        damp2 = jnp.where(r < s, v ** 4, 1.0)
        wdamp1 = jnp.ones_like(damp1)
        wdamp2 = jnp.ones_like(damp2)
    else:  # exponential
        explr = jnp.exp(-l * r)
        damp1 = 1.0 - explr * (0.5 * l * l * r * r + l * r + 1.0)
        damp2 = damp1 - explr * (l ** 3 * r ** 3 / 6.0)
        explrcut = jnp.exp(-l * rcut)
        wdamp1 = 1.0 - explrcut * (0.5 * l * l * rcut * rcut + l * rcut + 1.0)
        wdamp2 = wdamp1 - explrcut * (l ** 3 * rcut ** 3 / 6.0)

    d = pt.dimg                                     # [A,A,3]
    outer = d[..., :, None] * d[..., None, :]       # [A,A,3,3]
    eye = jnp.eye(3)
    block = (-3.0 * outer * (damp2 * ir5)[..., None, None] +
             eye * (damp1 * ir3)[..., None, None])
    if flags.polar_wolf_full:
        block = block + (3.0 * outer *
                         (wdamp2 * ir * ir / rcut ** 3)[..., None, None] -
                         eye * (wdamp1 / rcut ** 3)[..., None, None])

    A = state.n_atom_slots
    if pt.rows is None:
        offdiag = ~jnp.eye(A, dtype=bool) & pt.alive
    else:
        safe = jnp.clip(pt.rows, 0, A - 1)
        col = jnp.arange(A)[None, :]
        offdiag = (col != safe[:, None]) & pt.alive & \
            (pt.rows >= 0)[:, None]
    return jnp.where(offdiag[..., None, None], block, 0.0)


def thole_amatrix(state: SystemState, pt: PairTensors, flags: FFlags,
                  params: RunParams):
    """[A,A,3,3] dipole field tensor (src/System.Energy.cpp:2661-2770).

    Diagonal blocks are 1/alpha * I (MAXVALUE if alpha == 0); dead-atom
    pairs get zero off-diagonal blocks.
    """
    A = state.n_atom_slots
    block = thole_tile(state, pt, flags, params)
    inv_alpha = jnp.where(state.polarizability != 0.0,
                          1.0 / jnp.where(state.polarizability == 0.0, 1.0,
                                          state.polarizability),
                          const.MAXVALUE)
    diag = jnp.eye(3) * inv_alpha[:, None, None]    # [A,3,3]
    block = block.at[jnp.arange(A), jnp.arange(A)].set(diag)
    return block


def damp_factor(t, i: int):
    """(src/System.Energy.cpp:3108-3116)"""
    temp = 1.0 + t + 0.5 * t * t
    if i == 3:
        temp = temp + t ** 3 / 6.0
    return temp * jnp.exp(-t)


# ---------------------------------------------------------------------------
# static fields
# ---------------------------------------------------------------------------

def _not_self(state: SystemState, pt: PairTensors):
    A = state.n_atom_slots
    if pt.rows is None:
        return ~jnp.eye(A, dtype=bool)
    safe = jnp.clip(pt.rows, 0, A - 1)
    return (jnp.arange(A)[None, :] != safe[:, None]) & \
        (pt.rows >= 0)[:, None]


def _nopbc_field_scalars(state: SystemState, pt: PairTensors):
    """Masked per-pair scalar f with E_i = sum_j f_ij q_j d_ij
    (src/System.Energy.cpp:3300-3333).  f is symmetric in (i, j), so the
    same slice also gives the field *sourced by* the row atoms (used by the
    incremental polarization cache)."""
    mask = (~pt.frozen & ~pt.same_mol & pt.alive &
            (pt.rimg - const.SMALL_dR < state.pbc.cutoff) & (pt.rimg != 0.0) &
            _not_self(state, pt))
    r3 = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg) ** 3
    return jnp.where(mask, 1.0 / r3, 0.0)


def thole_field_nopbc(state: SystemState, pt: PairTensors):
    """(src/System.Energy.cpp:3300-3333)"""
    f = _nopbc_field_scalars(state, pt)
    q_j = state.charge[None, :, None]
    return jnp.sum(f[..., None] * q_j * pt.dimg, axis=1)


def _wolf_field_scalars(state: SystemState, pt: PairTensors, flags: FFlags,
                        params: RunParams):
    """(src/System.Energy.cpp:3337-3396); symmetric in (i, j)."""
    R = state.pbc.cutoff
    rR = 1.0 / R
    a = params.polar_wolf_alpha
    mask = (~pt.frozen & ~pt.same_mol & pt.alive &
            (pt.rimg - const.SMALL_dR < R) & (pt.rimg != 0.0) &
            _not_self(state, pt))
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    rr = 1.0 / r
    cutoffterm = (erfc(a * R) * rR * rR +
                  2.0 * a * const.OneOverSqrtPi * jnp.exp(-a * a * R * R) * rR)
    bigmess = (erfc(a * r) * rr * rr +
               2.0 * a * const.OneOverSqrtPi * jnp.exp(-a * a * r * r) * rr)
    f_a0 = (rr * rr - rR * rR) * rr
    f_an = (bigmess - cutoffterm) * rr
    f = jnp.where(a == 0.0, f_a0, f_an)
    return jnp.where(mask, f, 0.0)


def thole_field_wolf(state: SystemState, pt: PairTensors, flags: FFlags,
                     params: RunParams):
    """(src/System.Energy.cpp:3337-3396)"""
    f = _wolf_field_scalars(state, pt, flags, params)
    q_j = state.charge[None, :, None]
    return jnp.sum(f[..., None] * q_j * pt.dimg, axis=1)


def recip_term(state: SystemState, flags: FFlags, params: RunParams):
    """k-space static field (src/System.Energy.cpp:2834-2896)."""
    ea = params.polar_ewald_alpha
    k, k2 = kvectors(state, flags.ewald_kmax)       # [K,3],[K]
    q = jnp.where(state.atom_alive(), state.charge, 0.0)
    phase = phase_dot(state.pos, k)                 # [A,K]
    cosp, sinp = jnp.cos(phase), jnp.sin(phase)
    f1 = q @ cosp                                   # [K] sum q cos
    f2 = q @ sinp
    kweight = k / k2[:, None] * jnp.exp(-k2 / (4.0 * ea * ea))[:, None]  # [K,3]
    # E_i[p] += kw[k,p]*(sin(k.r_i)*f1 - cos(k.r_i)*f2)
    coeff = sinp * f1[None, :] - cosp * f2[None, :]  # [A,K]
    E = coeff @ kweight                              # [A,3]
    return E * 8.0 * const.pi / state.pbc.volume


def _real_field_scalars(state: SystemState, pt: PairTensors,
                        params: RunParams):
    """(src/System.Energy.cpp:2900-2940); symmetric in (i, j)."""
    a = params.polar_ewald_alpha
    base = pt.alive & ~pt.frozen & _not_self(state, pt) & \
        (pt.rimg != 0.0) & ~(pt.rimg > state.pbc.cutoff)
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    r2 = r * r
    f_ex = (2.0 * a * const.OneOverSqrtPi * jnp.exp(-a * a * r2) * r -
            erf(a * r)) / (r * r2)
    f_in = (2.0 * a * const.OneOverSqrtPi * jnp.exp(-a * a * r2) * r +
            erfc(a * r)) / (r2 * r)
    f = jnp.where(pt.es_excluded, f_ex, f_in)
    return jnp.where(base, f, 0.0)


def real_term(state: SystemState, pt: PairTensors, params: RunParams):
    """Real-space static field for the Ewald treatments
    (src/System.Energy.cpp:2900-2940)."""
    f = _real_field_scalars(state, pt, params)
    q_j = state.charge[None, :, None]
    return jnp.sum(f[..., None] * q_j * pt.dimg, axis=1)


def field_scalars(state: SystemState, pt: PairTensors, flags: FFlags,
                  params: RunParams):
    """Per-pair static-field scalar for the active treatment: the field at
    row i is sum_j f_ij q_j d_ij, and (f symmetric, d antisymmetric) the
    field at j sourced by row atoms is -sum_i f_ij q_i d_ij."""
    if flags.polar_ewald:
        return _real_field_scalars(state, pt, params)
    if flags.polar_wolf or flags.polar_wolf_full:
        return _wolf_field_scalars(state, pt, flags, params)
    return _nopbc_field_scalars(state, pt)


def thole_field(state: SystemState, pt: PairTensors, flags: FFlags,
                params: RunParams):
    """Static field dispatcher (src/System.Energy.cpp:3271-3297)."""
    if flags.polar_ewald:
        E = recip_term(state, flags, params) + real_term(state, pt, params)
    elif flags.polar_wolf or flags.polar_wolf_full:
        E = thole_field_wolf(state, pt, flags, params)
    else:
        E = thole_field_nopbc(state, pt)
    return jnp.where(state.atom_alive()[:, None], E, 0.0)


# ---------------------------------------------------------------------------
# solvers
# ---------------------------------------------------------------------------

def _contract(Amat, mu):
    """ef_induced = -sum_{j!=i} A_ij mu_j  (off-diagonal blocks only; the
    diagonal was overwritten with 1/alpha so exclude i==j)."""
    A = mu.shape[0]
    off = Amat * (~jnp.eye(A, dtype=bool))[:, :, None, None]
    return -jnp.einsum("ijpq,jq->ip", off, mu)


def _apply_relax(flags: FFlags, params: RunParams, new_mu, old_mu, it):
    if flags.polar_sor:
        return params.polar_gamma * new_mu + (1.0 - params.polar_gamma) * old_mu
    if flags.polar_esor:
        w = 1.0 - jnp.exp(-params.polar_gamma * it)
        return w * new_mu + (1.0 - w) * old_mu
    return new_mu


def gs_rank_order(state: SystemState, pt: PairTensors):
    """The ranked-GS iteration order: descending rank_metric, where the
    metric counts polarizable neighbours within 1.5x the smallest
    polarizable separation (src/System.cpp:1001-1029; each unordered
    pair increments both ends, i.e. a symmetric adjacency row-sum) and
    the bubble sort of update_ranking (src/System.Energy.cpp:3631-3653)
    is descending and stable for ties."""
    A = state.n_atom_slots
    pol = (state.polarizability != 0.0) & state.atom_alive()
    ok = pol[:, None] & pol[None, :] & ~jnp.eye(A, dtype=bool) & pt.alive
    r = jnp.where(ok, pt.rimg, const.MAXVALUE)
    rmin = jnp.min(r)
    metric = jnp.sum(ok & (pt.rimg <= 1.5 * rmin), axis=1).astype(
        jnp.float64)
    return jnp.argsort(-metric, stable=True).astype(jnp.int32)


def _gs_sweep(Amat, E_static, alpha, alive, mu, order):
    """One sequential Gauss-Seidel sweep in ``order``: each atom's new
    dipole is visible to the atoms after it in the same sweep
    (contract_dipoles with polar_gs/gs_ranked,
    src/System.Energy.cpp:3564-3598).  Inherently serial — an
    A-iteration lax.fori_loop of O(A) row contractions — so it exists
    on the exact A-matrix path only (A <= ~1k systems, the regime
    where reference-default GS configs live); the blocked/mixed
    large-system paths keep the Jacobi order."""
    def body(k, mu):
        i = order[k]
        Arow = jax.lax.dynamic_index_in_dim(Amat, i, 0, keepdims=False)
        mu_i = jax.lax.dynamic_index_in_dim(mu, i, 0, keepdims=False)
        self_blk = jax.lax.dynamic_index_in_dim(Arow, i, 0, keepdims=False)
        # off-diagonal contraction: remove the self block's contribution
        ef = -jnp.einsum("jpq,jq->p", Arow, mu) + self_blk @ mu_i
        a_i = jax.lax.dynamic_index_in_dim(alpha, i, 0, keepdims=False)
        e_i = jax.lax.dynamic_index_in_dim(E_static, i, 0, keepdims=False)
        ok_i = jax.lax.dynamic_index_in_dim(alive, i, 0, keepdims=False)
        new_i = jnp.where(ok_i & (a_i != 0.0), a_i * (e_i + ef), 0.0)
        return jax.lax.dynamic_update_slice(
            mu, new_i[None, :], (i, jnp.zeros((), order.dtype)))

    return jax.lax.fori_loop(0, mu.shape[0], body, mu)


def thole_iterative(state: SystemState, Amat, E_static, flags: FFlags,
                    params: RunParams, contract_fn=None, rank_order=None):
    """Fixed-point dipole solver (src/System.Energy.cpp:3450-3543).

    Implements the reference's non-Gauss-Seidel update order (contract with
    previous sweep's dipoles) including SOR/ESOR relaxation, fixed-iteration
    and precision-based termination, and the 128-iteration divergence
    fallback (mu = alpha*E_static, iterator_failed).

    With ``polar_gs`` / ``polar_gs_ranked`` on the exact A-matrix path
    (Amat given, contract_fn None) the sweep is the reference's TRUE
    sequential Gauss-Seidel (_gs_sweep): sweep 1 runs in natural atom
    order, later sweeps in ``rank_order`` when given (update_ranking
    runs after each contraction, src/System.Energy.cpp:3521-3523, so the
    first sweep predates any ranking) — finite-K iterates, and hence
    fixed-polar_max_iter trajectories, match the reference bit-for-bit
    (tests/test_polar_gs_iterates.py).  The large-system blocked/mixed
    paths keep the Jacobi order (same fixed point; validation warns).
    """
    alpha = state.polarizability[:, None]
    alive = state.atom_alive()[:, None]
    mu0 = alpha * E_static
    if not (flags.polar_sor or flags.polar_esor):
        mu0 = mu0 * params.polar_gamma
    if flags.polar_warm_start and not flags.polar_zodid:
        # TPU extension (off by default): start from the previous accepted
        # step's converged dipoles carried on the state.  Under precision
        # termination this reaches the same fixed point in fewer
        # iterations; under a fixed iteration count it lands closer to the
        # fixed point than the same count cold (quantified on the flagship
        # workload in tools/warmstart_study.py / docs/PERF.md — the
        # stationary residual is bounded by c^K * per-move-change/(1-c^K)
        # for contraction factor c, so errors do not accumulate).  The
        # reference always cold-starts from alpha*E (init_dipoles,
        # src/System.Energy.cpp:3547-3560), which stays the default.
        carried = jnp.any(state.mu != 0.0)
        mu0 = jnp.where(carried, state.mu, mu0)
    mu0 = jnp.where(alive, mu0, 0.0)

    if flags.polar_zodid:
        rrms = _dipole_rrms_mean(state, mu0, mu0 * 0)
        return mu0, jnp.zeros(()), jnp.zeros((), bool), rrms

    max_iter = (flags.polar_max_iter if params.polar_precision == 0.0
                else int(const.MAX_ITERATION_COUNT))
    allowed_sqerr = (params.polar_precision ** 2 *
                     const.DEBYE2SKA * const.DEBYE2SKA)

    contract = contract_fn if contract_fn is not None else \
        (lambda mu: _contract(Amat, mu))

    seq_gs = (flags.polar_gs or flags.polar_gs_ranked) and \
        Amat is not None and contract_fn is None
    if seq_gs:
        alive1 = state.atom_alive()
        alpha1 = state.polarizability
        nat = jnp.arange(mu0.shape[0], dtype=jnp.int32)
        rk = nat if rank_order is None else rank_order

        def gs_iterate(mu, it):
            order = jnp.where(it <= 1, nat, rk)
            return _gs_sweep(Amat, E_static, alpha1, alive1, mu, order)

        if params.polar_precision == 0.0 and max_iter <= 16:
            mu, old_mu = mu0, jnp.zeros_like(mu0)
            for it in range(1, max_iter + 1):
                new_mu = gs_iterate(mu, jnp.asarray(it, jnp.int32))
                mu, old_mu = _apply_relax(flags, params, new_mu, mu, it), mu
            iters = jnp.asarray(max_iter, jnp.int32)
        else:
            def cond(c):
                mu, old, it, done = c
                return ~done & (it < max_iter)

            def body(c):
                mu, old, it, _ = c
                it = it + 1
                new_mu = gs_iterate(mu, it)
                if params.polar_precision == 0.0:
                    done = it >= max_iter
                else:
                    done = jnp.all((new_mu - mu) ** 2 <= allowed_sqerr)
                return (_apply_relax(flags, params, new_mu, mu, it), mu,
                        it, done)

            mu, old_mu, iters, done = jax.lax.while_loop(
                cond, body, (mu0, jnp.zeros_like(mu0),
                             jnp.zeros((), jnp.int32), jnp.zeros((), bool)))
            failed = (params.polar_precision > 0.0) & ~done
            mu = jnp.where(failed,
                           jnp.where(alive, alpha * E_static, 0.0), mu)
            rrms = _dipole_rrms_mean(state, mu, old_mu)
            return mu, iters.astype(jnp.float64), failed, rrms
        rrms = _dipole_rrms_mean(state, mu, old_mu)
        return (mu, iters.astype(jnp.float64), jnp.zeros((), bool), rrms)

    if params.polar_precision == 0.0 and max_iter <= 16:
        # fixed iteration count: unroll statically.  A nested
        # lax.while_loop captures the (possibly GB-scale) contraction
        # coefficients as loop-invariant buffers, and inside an outer MC
        # scan XLA then copies every plane once per step (~1.3 ms per
        # 420 MB plane at 10k atoms); straight-line code aliases cleanly.
        mu, old_mu = mu0, jnp.zeros_like(mu0)
        for it in range(1, max_iter + 1):
            ef_ind = contract(mu)
            new_mu = alpha * (E_static + ef_ind)
            new_mu = jnp.where(alive, new_mu, 0.0)
            relaxed = _apply_relax(flags, params, new_mu, mu, it)
            mu, old_mu = relaxed, mu
        iters = jnp.asarray(max_iter, jnp.int32)
        done = jnp.ones((), bool)
    else:
        def cond(carry):
            mu, old, it, done = carry
            return ~done & (it < max_iter)

        def body(carry):
            mu, old, it, _ = carry
            it = it + 1
            ef_ind = contract(mu)
            new_mu = alpha * (E_static + ef_ind)
            new_mu = jnp.where(alive, new_mu, 0.0)
            relaxed = _apply_relax(flags, params, new_mu, mu, it)
            if params.polar_precision == 0.0:
                done = it >= max_iter
            else:
                err2 = (new_mu - mu) ** 2
                done = jnp.all(err2 <= allowed_sqerr)
            return (relaxed, mu, it, done)

        mu, old_mu, iters, done = jax.lax.while_loop(
            cond, body, (mu0, jnp.zeros_like(mu0),
                         jnp.zeros((), jnp.int32), jnp.zeros((), bool)))

    failed = (params.polar_precision > 0.0) & ~done
    mu = jnp.where(failed, jnp.where(alive, alpha * E_static, 0.0), mu)
    rrms = _dipole_rrms_mean(state, mu, old_mu)
    return mu, iters.astype(jnp.float64), failed, rrms


def _dipole_rrms_mean(state: SystemState, new_mu, old_mu):
    """(src/System.Energy.cpp:3147-3177 + 2639-2657)"""
    num = jnp.sum((new_mu - old_mu) ** 2, axis=-1)
    den = jnp.sum(new_mu * new_mu, axis=-1)
    rrms = jnp.sqrt(num / jnp.where(den == 0.0, 1.0, den))
    rrms = jnp.where(jnp.isfinite(rrms) & (den != 0.0), rrms, 0.0)
    return jnp.sum(rrms) / state.n_atom_slots


def thole_exact(state: SystemState, Amat, E_static):
    """Exact dipoles via linear solve (replaces B-matrix LU inversion,
    src/System.Energy.cpp:3660-3710)."""
    A = state.n_atom_slots
    M = jnp.transpose(Amat, (0, 2, 1, 3)).reshape(3 * A, 3 * A)
    mu = solve_sym(M, E_static.reshape(-1)).reshape(A, 3)
    return jnp.where(state.atom_alive()[:, None], mu, 0.0)


# --- full-Ewald SCF (Nymand & Linse) ---------------------------------------

def induced_real_term(state: SystemState, pt: PairTensors, flags: FFlags,
                      params: RunParams, mu):
    """(src/System.Energy.cpp:3046-3104)"""
    a = params.polar_ewald_alpha
    l = params.polar_damp
    A = state.n_atom_slots
    pol = state.polarizability
    mask = (pt.alive & ~jnp.eye(A, dtype=bool) &
            (pol[:, None] != 0.0) & (pol[None, :] != 0.0) &
            ~(pt.rimg > state.pbc.cutoff))
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)
    ir3 = 1.0 / r ** 3
    ir5 = 1.0 / r ** 5
    erfcar = erfc(a * r)
    expa2r2 = jnp.exp(-a * a * r * r)
    s2 = (erfcar + 2.0 * a * r * const.OneOverSqrtPi * expa2r2 +
          4.0 * (a ** 3) * (r ** 3) / 3.0 * const.OneOverSqrtPi * expa2r2 -
          damp_factor(l * r, 3))
    s1 = (erfcar + 2.0 * a * r * const.OneOverSqrtPi * expa2r2 -
          damp_factor(l * r, 2))
    d = pt.dimg
    outer = d[..., :, None] * d[..., None, :]
    T = 3.0 * outer * (s2 * ir5)[..., None, None] - \
        jnp.eye(3) * (s1 * ir3)[..., None, None]
    T = jnp.where(mask[..., None, None], T, 0.0)
    return jnp.einsum("ijpq,jq->ip", T, mu)


def induced_recip_term(state: SystemState, flags: FFlags, params: RunParams,
                       mu):
    """(src/System.Energy.cpp:2975-3042; corrected vector k-weight)"""
    a = params.polar_ewald_alpha
    k, k2 = kvectors(state, flags.ewald_kmax)
    alive = state.atom_alive()
    mu_m = jnp.where(alive[:, None], mu, 0.0)
    phase = phase_dot(state.pos, k)              # [A,K]
    kmu = phase_dot(mu_m, k)                     # [A,K]
    Pcos = jnp.sum(kmu * jnp.cos(phase), axis=0) # [K]
    Psin = jnp.sum(kmu * jnp.sin(phase), axis=0)
    w = 8.0 * const.pi / state.pbc.volume * jnp.exp(-k2 / (4 * a * a)) / k2
    coeff = -(jnp.sin(phase) * Psin[None] + jnp.cos(phase) * Pcos[None])  # [A,K]
    return (coeff * w[None]) @ k                 # [A,3]


def induced_corr_term(state: SystemState, params: RunParams, mu):
    """(src/System.Energy.cpp:3120-3143)"""
    a = params.polar_ewald_alpha
    alive = state.atom_alive()[:, None]
    mu_m = jnp.where(alive, mu, 0.0)
    total = jnp.sum(mu_m, axis=0)
    return (-4.0 * const.pi / (3.0 * state.pbc.volume) * total[None, :] +
            4.0 * a ** 3 / (3.0 * const.SqrtPi) * mu_m)


def ewald_full(state: SystemState, pt: PairTensors, flags: FFlags,
               params: RunParams):
    """Full-Ewald SCF (src/System.Energy.cpp:2785-2830). Returns
    (E_static, mu, iterations, failed, rrms, ef_induced_change)."""
    E_static = recip_term(state, flags, params) + real_term(state, pt, params)
    alive = state.atom_alive()[:, None]
    E_static = jnp.where(alive, E_static, 0.0)
    alpha = state.polarizability[:, None]
    mu0 = jnp.where(alive, alpha * E_static, 0.0)

    max_iter = (flags.polar_max_iter if params.polar_precision == 0.0
                else int(const.MAX_ITERATION_COUNT))
    allowed_sqerr = (params.polar_precision ** 2 *
                     const.DEBYE2SKA * const.DEBYE2SKA)

    def induced(mu):
        return (induced_real_term(state, pt, flags, params, mu) +
                induced_recip_term(state, flags, params, mu) +
                induced_corr_term(state, params, mu))

    def cond(carry):
        mu, old, it, done = carry
        return ~done & (it < max_iter)

    def body(carry):
        mu, old, it, _ = carry
        ef_ind = induced(mu)
        new_mu = jnp.where(alive, alpha * (E_static + ef_ind), 0.0)
        relaxed = _apply_relax(flags, params, new_mu, mu, it + 1)
        if params.polar_precision == 0.0:
            done = (it + 1) >= max_iter
        else:
            done = jnp.all((new_mu - mu) ** 2 <= allowed_sqerr)
        return (relaxed, mu, it + 1, done)

    mu, old_mu, iters, done = jax.lax.while_loop(
        cond, body, (mu0, jnp.zeros_like(mu0), jnp.zeros((), jnp.int32),
                     jnp.zeros((), bool)))
    failed = (params.polar_precision > 0.0) & ~done

    if flags.polar_palmo:
        ef_ind = induced(mu)
        safe_alpha = jnp.where(alpha == 0.0, 1.0, alpha)
        change = ef_ind - (mu / safe_alpha - E_static)
        change = jnp.where(alive & (alpha != 0.0), change, 0.0)
    else:
        change = jnp.zeros_like(mu)

    rrms = _dipole_rrms_mean(state, mu, old_mu)
    return E_static, mu, iters.astype(jnp.float64), failed, rrms, change


def thole_field_blocked(state: SystemState, flags: FFlags,
                        params: RunParams, block: int = 128):
    """Static field without [A,A] tensors: scan rect row blocks."""
    from .pairwise import assemble_tiles, build_pairs_rect, tile_starts
    A = state.n_atom_slots
    nb = -(-A // block)
    starts = jnp.asarray(tile_starts(A, block))

    def body(_, b):
        if A <= block:
            rows_f = jnp.arange(block)
            rows = jnp.where(rows_f < A, rows_f, -1)
        else:
            rows = starts[b] + jnp.arange(block)
        pt = build_pairs_rect(state, flags, rows)
        if flags.polar_ewald:
            e = real_term(state, pt, params)
        elif flags.polar_wolf or flags.polar_wolf_full:
            e = thole_field_wolf(state, pt, flags, params)
        else:
            e = thole_field_nopbc(state, pt)
        return None, e

    _, tiles = jax.lax.scan(body, None, jnp.arange(nb))
    E = assemble_tiles(tiles, A, block)
    if flags.polar_ewald:
        E = E + recip_term(state, flags, params)
    return jnp.where(state.atom_alive()[:, None], E, 0.0)


def _thole_damps(state: SystemState, pt: PairTensors, flags: FFlags,
                 params: RunParams):
    """(damp1, damp2, wdamp1, wdamp2) for the pairs in pt — the damping
    factors of thole_amatrix (src/System.Energy.cpp:2712-2742)."""
    l = params.polar_damp
    rcut = state.pbc.cutoff
    r = pt.rimg
    if flags.damp_type == const.DAMPING_OFF:
        damp1 = jnp.where(pt.es_excluded, 0.0, 1.0)
        return damp1, damp1, damp1, damp1
    if flags.damp_type == const.DAMPING_LINEAR:
        ai = pt.row(state.polarizability)[:, None] * \
            state.polarizability[None, :]
        sd = l * ai ** (1.0 / 6.0)
        v = r / jnp.where(sd == 0.0, 1.0, sd)
        damp1 = jnp.where(r < sd, (4.0 - 3.0 * v) * v ** 3, 1.0)
        damp2 = jnp.where(r < sd, v ** 4, 1.0)
        return damp1, damp2, jnp.ones_like(damp1), jnp.ones_like(damp2)
    explr = jnp.exp(-l * r)
    damp1 = 1.0 - explr * (0.5 * l * l * r * r + l * r + 1.0)
    damp2 = damp1 - explr * (l ** 3 * r ** 3 / 6.0)
    explrcut = jnp.exp(-l * rcut)
    wdamp1 = 1.0 - explrcut * (0.5 * l * l * rcut * rcut + l * rcut + 1.0)
    wdamp2 = wdamp1 - explrcut * (l ** 3 * rcut ** 3 / 6.0)
    return damp1, damp2, wdamp1, wdamp2


def contract_blocked(state: SystemState, flags: FFlags, params: RunParams,
                     mu, block: int = 128):
    """Matrix-free ef_induced = -sum_j T_ij mu_j.

    Expands T mu algebraically (T_ij mu_j = -3 d (d.mu) damp2/r^5
    + damp1 mu/r^3 [+ wolf-full corrections]) so only [B,A]-shaped
    scalars are live — no [A,A,3,3] A-matrix, no [B,A,3,3] tiles."""
    from .pairwise import assemble_tiles, build_pairs_rect, tile_starts
    A = state.n_atom_slots
    nb = -(-A // block)
    rcut = state.pbc.cutoff
    starts = jnp.asarray(tile_starts(A, block))

    def body(_, b):
        if A <= block:
            rows_f = jnp.arange(block)
            rows = jnp.where(rows_f < A, rows_f, -1)
        else:
            rows = starts[b] + jnp.arange(block)
        pt = build_pairs_rect(state, flags, rows)
        r = pt.rimg
        r_safe = jnp.where(r == 0.0, 1.0, r)
        ir = 1.0 / r_safe
        ir3 = jnp.where(r == 0.0, const.MAXVALUE, ir ** 3)
        ir5 = jnp.where(r == 0.0, const.MAXVALUE, ir ** 5)
        damp1, damp2, wdamp1, wdamp2 = _thole_damps(state, pt, flags,
                                                    params)
        mask = _not_self(state, pt) & pt.alive
        dot = jnp.einsum("rjq,jq->rj", pt.dimg, mu)       # [B,A]
        c_outer = -3.0 * damp2 * ir5
        c_diag = damp1 * ir3
        if flags.polar_wolf_full:
            c_outer = c_outer + 3.0 * wdamp2 * ir * ir / rcut ** 3
            c_diag = c_diag - wdamp1 / rcut ** 3
        c_outer = jnp.where(mask, c_outer, 0.0)
        c_diag = jnp.where(mask, c_diag, 0.0)
        ef = -(jnp.einsum("rj,rjp->rp", c_outer * dot, pt.dimg) +
               c_diag @ mu)
        return None, ef

    _, tiles = jax.lax.scan(body, None, jnp.arange(nb))
    return assemble_tiles(tiles, A, block)


def mixed_coeff_scalars(state: SystemState, pt: PairTensors, flags: FFlags,
                        params: RunParams):
    """(c_outer, c_diag) float32 dipole-contraction coefficients for the
    pairs in ``pt``: T_ij mu_j = c_outer d (d.mu) + c_diag mu.  Symmetric
    in (i, j); used for both full precomputes and incremental row/column
    updates."""
    rcut = state.pbc.cutoff
    r = pt.rimg
    r_safe = jnp.where(r == 0.0, 1.0, r)
    ir = 1.0 / r_safe
    ir3 = ir ** 3
    ir5 = ir ** 5
    damp1, damp2, wdamp1, wdamp2 = _thole_damps(state, pt, flags, params)
    mask = _not_self(state, pt) & pt.alive
    c_outer = -3.0 * damp2 * ir5
    c_diag = damp1 * ir3
    if flags.polar_wolf_full:
        c_outer = c_outer + 3.0 * wdamp2 * ir * ir / rcut ** 3
        c_diag = c_diag - wdamp1 / rcut ** 3
    c_outer = jnp.where(mask, c_outer, 0.0).astype(jnp.float32)
    c_diag = jnp.where(mask, c_diag, 0.0).astype(jnp.float32)
    return c_outer, c_diag


def plane_mode(flags: FFlags) -> int:
    """How many f32 planes the mixed-precision SCF streams per
    contraction (the representations of fold_outer_rows):

    - 3 — exponential damping: ``c_outer``/``c_diag`` are pure functions
      of r alone, so the kernel recomputes them on the fly from masked
      displacement planes (HBM traffic is the bottleneck; VPU flops are
      comparatively free).
    - 4 — linear / off damping (per-pair damping widths, or the
      es_excluded mask): ``s = sqrt(-c_outer) d`` folds the outer
      coefficient into the displacements, leaving ``(cd, sx, sy, sz)``.
    - 5 — polar_wolf_full: the wolf correction makes c_outer
      sign-indefinite, keeping the unfolded ``(co, cd, dx, dy, dz)``.

    ``flags.polar_plane_mode = 4`` forces the folded 4-plane form under
    exponential damping too — same math, more HBM bytes for fewer VPU
    flops per pair; which side of the trade wins is measured per chip
    (docs/PERF.md).
    """
    if flags.polar_wolf_full:
        return 5
    if flags.polar_plane_mode == 4:
        return 4
    if flags.damp_type == const.DAMPING_EXPONENTIAL:
        return 3
    return 4


def coeffs_from_d(dx, dy, dz, l):
    """(c_outer, c_diag) recomputed in f32 from masked displacement
    planes under exponential Thole damping (the 3-plane mode of
    plane_mode): both are functions of r alone —
    ``co = -3 damp2 / r^5``, ``cd = damp1 / r^3`` with the damps of
    _thole_damps (src/System.Energy.cpp:2712-2726).  Masked pairs are
    encoded as d == 0 (self pairs, dead slots) and yield co = cd = 0,
    exactly as mixed_coeff_scalars masks them.  Pure jnp elementwise
    math so the same helper serves the XLA fallback, the [S,A] row-block
    corrections, and the Pallas kernels (VPU elementwise + two
    transcendentals; no MXU, no layout changes)."""
    r2 = dx * dx + dy * dy + dz * dz
    live = r2 > 0.0
    r2s = jnp.where(live, r2, jnp.float32(1.0))
    ir = jax.lax.rsqrt(r2s)
    r = r2s * ir                      # sqrt(r2)
    ir2 = ir * ir
    ir3 = ir * ir2
    ir5 = ir3 * ir2
    x = l * r
    ex = jnp.exp(-x)
    x2 = x * x
    damp1 = 1.0 - ex * (0.5 * x2 + x + 1.0)
    damp2 = damp1 - ex * (x * x2 * jnp.float32(1.0 / 6.0))
    co = jnp.where(live, -3.0 * damp2 * ir5, jnp.float32(0.0))
    cd = jnp.where(live, damp1 * ir3, jnp.float32(0.0))
    return co, cd


def fold_outer_rows(co, cd, d32x, d32y, d32z, flags: FFlags):
    """The mixed-precision SCF's plane representation (see plane_mode):
    returns a 3-, 4- or 5-tuple of [S,A] f32 planes.

    Mode 4 folds the outer coefficient into the displacements:
    ``c_outer = -3 damp2 / r^5 <= 0`` for every damping variant (damp2 is
    in [0,1]: off/linear by construction, exponential because
    ``e^-x (1+x+x^2/2+x^3/6) <= 1``), so ``co d (d.mu)`` becomes
    ``-s (s.mu)`` with ``s = sqrt(-co) d``; only the polar_wolf_full
    correction ``+3 wdamp2 / (r^2 rcut^3)``
    (src/System.Energy.cpp:2728-2742) can flip the sign at small r, so
    that mode keeps the 5-plane form.  Mode 3 (exponential damping)
    stores only the displacements, masked to zero where
    mixed_coeff_scalars masks (``co != 0`` is an exact proxy: co < 0
    strictly for every unmasked pair with r > 0, and co never underflows
    in the physical range r in [1e-2, 60] A); the coefficients are
    recomputed in-kernel by coeffs_from_d.  Both s and masked-d inherit
    d's antisymmetry (sqrt(-co) and the mask are symmetric), so the
    cache's row/column symmetry machinery is unchanged.  The max(.,0)
    guards rounding: damp2 may round to -1 ulp where it vanishes.
    """
    mode = plane_mode(flags)
    if mode == 5:
        return co, cd, d32x, d32y, d32z
    if mode == 3:
        live = co != 0.0
        z = jnp.float32(0.0)
        return (jnp.where(live, d32x, z), jnp.where(live, d32y, z),
                jnp.where(live, d32z, z))
    w = jnp.sqrt(jnp.maximum(-co, jnp.float32(0.0)))
    return cd, w * d32x, w * d32y, w * d32z


def mixed_field_coeffs(state: SystemState, flags: FFlags, params: RunParams,
                       block: int = 128):
    """One-time float32 pair coefficients for the mixed-precision SCF,
    fused with the static field: returns ((c_outer?, c_diag, dimg_f32),
    E_static) — the 4- or 5-plane tuple of fold_outer_rows.

    The dipole-field contraction T mu depends on mu only through two
    einsums; everything geometric (minimum image, Thole damping, wolf
    corrections) is mu-independent, so the blocked SCF was rebuilding it
    every iteration in emulated float64.  Precompute it once here as
    float32 [A,A] scalars + [A,A,3] displacements (~2 GB at 10k atoms) so
    each iteration is native-f32 VPU/MXU work.  The static field rides the
    same pass (build_pairs_rect is the dominant cost, ~1.4 s of each 1.5 s
    pass at 10k atoms on v5e, so fusing halves setup).  Field error is
    ~1e-6 relative — far below thermal noise, but not bit-identical to the
    f64 path, hence the opt-in ``FFlags.polar_mixed``.
    """
    from .pairwise import assemble_tiles, build_pairs_rect, tile_starts
    A = state.n_atom_slots
    nb = -(-A // block)
    starts = jnp.asarray(tile_starts(A, block))

    def body(_, b):
        if A <= block:
            rows_f = jnp.arange(block)
            rows = jnp.where(rows_f < A, rows_f, -1)
        else:
            rows = starts[b] + jnp.arange(block)
        pt = build_pairs_rect(state, flags, rows)
        c_outer, c_diag = mixed_coeff_scalars(state, pt, flags, params)
        if flags.polar_ewald:
            e = real_term(state, pt, params)
        elif flags.polar_wolf or flags.polar_wolf_full:
            e = thole_field_wolf(state, pt, flags, params)
        else:
            e = thole_field_nopbc(state, pt)
        d32 = pt.dimg.astype(jnp.float32)
        planes = fold_outer_rows(c_outer, c_diag, d32[..., 0],
                                 d32[..., 1], d32[..., 2], flags)
        return None, (planes, e)

    _, (planes, e) = jax.lax.scan(body, None, jnp.arange(nb))
    planes = tuple(assemble_tiles(p, A, block) for p in planes)
    E = assemble_tiles(e, A, block)
    if flags.polar_ewald:
        E = E + recip_term(state, flags, params)
    E = jnp.where(state.atom_alive()[:, None], E, 0.0)
    return planes, E


def contract_mixed(coeffs, mu, l=None):
    """ef_induced = -T mu from precomputed f32 coefficients — the
    3-plane ``(dmx, dmy, dmz)``, 4-plane ``(cd, sx, sy, sz)`` or 5-plane
    ``(co, cd, dx, dy, dz)`` tuple of fold_outer_rows.  The 3-plane mode
    needs the exponential damping width ``l`` (params.polar_damp) to
    recompute the coefficients on the fly (coeffs_from_d).

    The displacements are stored as [A,A] component planes rather than
    one [A,A,3] tensor: a trailing length-3 axis tiles terribly on
    the TPU lane dimension, while [A,A] planes make the whole contraction
    a fused elementwise + lane-reduction pass.  All math is true f32
    (never the MXU bf16 default), accumulated outputs cast back to f64.
    """
    if len(coeffs) == 3 and l is None:
        raise ValueError("3-plane mixed coefficients need l=polar_damp")
    lead = coeffs[0]
    if l is None:
        l = 0.0
    if jax.default_backend() not in ("cpu",):
        from . import pallas_polar
        # square planes only: row-sharded callers (parallel.sharded_energy)
        # pass rectangular [A_local, A] slices, which take the XLA path
        if lead.shape[0] == lead.shape[1] and \
                pallas_polar.supported(lead.shape[0]):
            import os
            # T is symmetric: the triangle kernel reads ~half the bytes
            # (this op is HBM-bound); MPMCXX_SYM_KERNEL=0 falls back.
            # MPMCXX_TRI_KERNEL=1 selects the exact-triangle successor
            # schedule (contract_pallas_tri: no c==nr/2 band revisit,
            # resident VMEM accumulators — see tools/ab_tri_kernel.py
            # for the on-chip A/B gate before flipping the default).
            if pallas_polar._pick_b_sym(lead.shape[0]) and \
                    os.environ.get("MPMCXX_SYM_KERNEL", "1") != "0":
                if os.environ.get("MPMCXX_TRI_KERNEL", "0") == "1":
                    return pallas_polar.contract_pallas_tri(coeffs, mu, l=l)
                return pallas_polar.contract_pallas_sym(coeffs, mu, l=l)
            return pallas_polar.contract_pallas(coeffs, mu, l=l)
    if len(coeffs) == 3:
        dx, dy, dz = coeffs
        co, cd = coeffs_from_d(dx, dy, dz, jnp.float32(l))
    else:
        co = coeffs[0] if len(coeffs) == 5 else None
        cd, dx, dy, dz = coeffs[-4:]
    m = mu.astype(jnp.float32)
    mx, my, mz = m[:, 0][None, :], m[:, 1][None, :], m[:, 2][None, :]
    dot = dx * mx + dy * my + dz * mz
    s = -dot if co is None else co * dot
    ex = jnp.sum(s * dx + cd * mx, axis=1)
    ey = jnp.sum(s * dy + cd * my, axis=1)
    ez = jnp.sum(s * dz + cd * mz, axis=1)
    return -jnp.stack([ex, ey, ez], axis=1).astype(jnp.float64)


def polar_blocked(state: SystemState, flags: FFlags, params: RunParams,
                  block: int = 128) -> PolarResult:
    """Large-system polarization: blocked static field + matrix-free
    iterative solver (the reference's O(iters * 9N^2) SCF with the
    A-matrix never materialised)."""
    if flags.polar_mixed:
        coeffs, E_static = mixed_field_coeffs(state, flags, params, block)

        def contract_fn(m):
            return contract_mixed(coeffs, m, l=params.polar_damp)
    else:
        E_static = thole_field_blocked(state, flags, params, block)

        def contract_fn(m):
            return contract_blocked(state, flags, params, m, block)
    return finish_polar(state, flags, params, E_static, contract_fn)


def finish_polar(state: SystemState, flags: FFlags, params: RunParams,
                 E_static, contract_fn) -> PolarResult:
    """Solve for the dipoles given a static field and a matrix-free
    contraction, and assemble the polarization energy (shared tail of the
    blocked and incremental-cache paths)."""
    if flags.polar_iterative:
        mu, iters, failed, rrms = thole_iterative(
            state, None, E_static, flags, params, contract_fn=contract_fn)
    else:
        # exact path: matrix-free CG on A mu = E (A is symmetric; PD for
        # physical polarizabilities) — the "matrix-free CG" target design
        alpha = state.polarizability[:, None]
        inv_alpha = jnp.where(alpha != 0.0,
                              1.0 / jnp.where(alpha == 0.0, 1.0, alpha),
                              const.MAXVALUE)
        alive = state.atom_alive()[:, None]

        def matvec(m):
            return m * inv_alpha - contract_fn(m)

        b = jnp.where(alive, E_static, 0.0)
        mu, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=1e-12,
                                           maxiter=400)
        mu = jnp.where(alive, mu, 0.0)
        iters = jnp.zeros(())
        failed = jnp.zeros((), bool)
        rrms = jnp.zeros(())
    pot = jnp.sum(mu * E_static)
    if flags.polar_palmo:
        ef_ind = contract_fn(mu)
        safe_alpha = jnp.where(state.polarizability[:, None] == 0.0, 1.0,
                               state.polarizability[:, None])
        implied = mu / safe_alpha - E_static
        change = jnp.where(state.atom_alive()[:, None] &
                           (state.polarizability[:, None] != 0.0),
                           ef_ind - implied, 0.0)
        pot = pot + jnp.sum(mu * change)
    return PolarResult(-0.5 * pot, mu, iters, failed, rrms)


def polar(state: SystemState, pt: PairTensors, flags: FFlags,
          params: RunParams) -> PolarResult:
    """Induction energy dispatcher (src/System.Energy.cpp:2534-2635)."""
    if flags.polar_ewald_full:
        E_static, mu, iters, failed, rrms, change = ewald_full(
            state, pt, flags, params)
        pot = jnp.sum(mu * E_static)
        if flags.polar_palmo:
            pot = pot + jnp.sum(mu * change)
        return PolarResult(-0.5 * pot, mu, iters, failed, rrms)

    Amat = thole_amatrix(state, pt, flags, params)
    E_static = thole_field(state, pt, flags, params)

    if flags.polar_iterative:
        ro = gs_rank_order(state, pt) if flags.polar_gs_ranked else None
        mu, iters, failed, rrms = thole_iterative(state, Amat, E_static,
                                                  flags, params,
                                                  rank_order=ro)
        pot = jnp.sum(mu * E_static)
        if flags.polar_palmo:
            # Palmo: change in induced field between one more contraction and
            # the field implied by the final dipoles
            # (src/System.Energy.cpp:3602-3627)
            ef_ind = _contract(Amat, mu)
            safe_alpha = jnp.where(state.polarizability[:, None] == 0.0, 1.0,
                                   state.polarizability[:, None])
            implied = mu / safe_alpha - E_static
            change = ef_ind - implied
            change = jnp.where(state.atom_alive()[:, None] &
                               (state.polarizability[:, None] != 0.0),
                               change, 0.0)
            pot = pot + jnp.sum(mu * change)
        return PolarResult(-0.5 * pot, mu, iters, failed, rrms)

    # exact matrix path
    mu = thole_exact(state, Amat, E_static)
    pot = jnp.sum(mu * E_static)
    return PolarResult(-0.5 * pot, mu, jnp.zeros(()), jnp.zeros((), bool),
                       jnp.zeros(()))


def polarizability_tensor_report(state: SystemState, flags: FFlags,
                                 params: RunParams):
    """Molecular polarizability tensor from the inverted Thole matrix.

    The reference's exact-path analysis mode (thole_polarizability_tensor,
    src/System.Energy.cpp:3714-3760, dispatched from polar() at
    :2601-2605): B = A^-1, C[p][q] = sum over atom blocks of
    B[3i+p][3j+q], isotropic = tr(C)/3.  A report, not a hot path: the
    inversion runs in host float64 on the live-atom subset (the reference
    inverts the full 3N x 3N A matrix by LU and then exits the run).

    Returns ``(A_dense, B, C, isotropic)`` as numpy arrays; ``A_dense``
    and ``B`` are [3n,3n] over the n live atoms in slot order.
    """
    import numpy as np
    from .pairwise import build_pairs

    pt = build_pairs(state, flags)
    Amat = np.asarray(thole_amatrix(state, pt, flags, params))
    alive = np.asarray(state.atom_alive())
    idx = np.nonzero(alive)[0]
    n = len(idx)
    # [A,A,3,3] blocks -> dense [3n,3n] over live atoms
    A_dense = np.transpose(Amat[np.ix_(idx, idx)],
                           (0, 2, 1, 3)).reshape(3 * n, 3 * n)
    B = np.linalg.inv(A_dense)
    C = B.reshape(n, 3, n, 3).sum(axis=(0, 2))
    isotropic = np.trace(C) / 3.0
    return A_dense, B, C, isotropic


def print_polarizability_tensor(state: SystemState, flags: FFlags,
                                params: RunParams, out) -> None:
    """Print the A matrix, B matrix and molecular polarizability tensor in
    the reference's format (print_matrix src/System.Energy.cpp:2497-2507;
    tensor block :3745-3760)."""
    A_dense, B, C, isotropic = polarizability_tensor_report(
        state, flags, params)

    def print_matrix(m):
        out.write("\n")
        for row in m:
            out.write("".join(f"{v:.3f} " for v in row) + "\n")
        out.write("\n")

    out.write("POLAR: A matrix:\n")
    print_matrix(A_dense)
    out.write("POLAR: B matrix:\n")
    print_matrix(B)
    out.write("POLARIZATION: polarizability tensor (A^3):\n")
    out.write("##########################\n")
    for p in range(3):
        out.write("".join(f"{C[p][q]:.4f} " for q in range(3)) + "\n")
    out.write("##########################\n")
    out.write(f"isotropic = {isotropic:.4f}\n")
    out.write(f"XX/ZZ = {C[0][0] / C[2][2]:.4f}\n")
