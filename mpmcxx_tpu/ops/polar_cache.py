"""Incrementally maintained polarization state for the MC chain.

The reference repolarizes from scratch every MC step (System::energy always
calls polar(), src/System.Energy.cpp:93-116, which rebuilds the static
field and the damped dipole interactions over all N^2 pairs).  On TPU the
mu-independent parts of that work — pair geometry, Thole damping, static
field, k-space phases — live in a cache that a local move updates in
O(S*A) (S = atoms of the moved molecule), so the per-move polarization
cost collapses to the SCF contractions themselves:

- ``co``/``cd``/``d``: the float32 dipole-contraction coefficients of
  ops.polar.mixed_field_coeffs in the representation of
  ops.polar.fold_outer_rows — THREE masked displacement planes under
  exponential damping (coefficients recomputed in-kernel,
  ops.polar.coeffs_from_d), four ``(cd, s=sqrt(-co) d)`` for linear/off
  damping, five under polar_wolf_full.  Row updates are exact (the same
  formula recomputed for the moved rows); columns follow by symmetry
  (cd symmetric, d and s antisymmetric), so the arrays stay
  bit-identical to a full rebuild.
- ``e_pair``: the pairwise (ewald-real / wolf / nopbc) static field, f64.
  A move shifts every atom's field by the moved atoms' old/new source
  contributions (field scalars are symmetric, displacements antisymmetric)
  and recomputes the moved rows outright.
- ``cosp``/``sinp``/``f1``/``f2``: per-atom k-space phases (f32) and
  charge structure factors (f64) over the polar k-lattice, giving the
  reciprocal static field (src/System.Energy.cpp:2834-2896) in O(A*K)
  float32 work instead of recomputing A*K trig in emulated f64.

Requires FFlags.polar_mixed (the cache IS the mixed-precision coefficient
set).  polar_ewald_full is excluded — its SCF couples dipoles through
k-space, which has no row-local update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as const
from ..flags import FFlags, RunParams
from ..state import SystemState
from . import polar as polar_mod
from .ewald import kvectors
from .pairwise import (assemble_tiles, build_pairs_rect,
                       contract_small_rows, normalize_window, phase_dot,
                       rows_field, slice_rows, sum_small_rows, tile_starts,
                       update_rows)


class PolarCache(NamedTuple):
    co: jnp.ndarray      # [A,A] f32 outer-product coefficient — [0,0]
    #                      placeholder except under polar_wolf_full
    #                      (ops.polar.fold_outer_rows folds or recomputes
    #                      it otherwise)
    cd: jnp.ndarray      # [A,A] f32 diagonal coefficient — [0,0]
    #                      placeholder in the 3-plane exponential-damping
    #                      mode (recomputed in-kernel with co)
    dx: jnp.ndarray      # [A,A] f32 (masked/scaled) minimum-image
    dy: jnp.ndarray      # displacement planes (three [A,A] planes tile
    dz: jnp.ndarray      #  the TPU lane axis; an [A,A,3] tensor would not)
    e_pair: jnp.ndarray  # [A,3] f64 pairwise static field
    cosp: jnp.ndarray    # [A,K] f32 cos(k.r_i)  (K=0 when not polar_ewald)
    sinp: jnp.ndarray    # [A,K] f32 sin(k.r_i)
    f1: jnp.ndarray      # [K] f64 sum_j q_j cos(k.r_j)
    f2: jnp.ndarray      # [K] f64 sum_j q_j sin(k.r_j)


def empty_cache() -> PolarCache:
    z2 = jnp.zeros((0, 0))
    return PolarCache(z2, z2, z2, z2, z2, jnp.zeros((0, 3)),
                      z2, z2, jnp.zeros(0), jnp.zeros(0))


def planes_of(cache: PolarCache):
    """The cache's contraction-plane tuple in ops.polar.contract_mixed
    form: 3 planes ``(dmx, dmy, dmz)`` in the exponential-damping mode
    (``co`` and ``cd`` are [0,0] placeholders), 4 ``(cd, sx, sy, sz)``
    for linear/off damping, 5 under polar_wolf_full."""
    if cache.co.size == 0 and cache.cd.size == 0:
        return (cache.dx, cache.dy, cache.dz)
    if cache.co.size == 0:
        return (cache.cd, cache.dx, cache.dy, cache.dz)
    return (cache.co, cache.cd, cache.dx, cache.dy, cache.dz)


def supports(flags: FFlags, n_atom_slots: int = 0) -> bool:
    """True when polarization can ride the incremental cache (and the rest
    of the energy is pairwise + k-space, as ops.delta requires).

    ``n_atom_slots``: when given, also require the three-to-five float32
    [A,A] planes (see planes_of) to fit comfortably in one
    chip's HBM (~12-20 A^2 bytes; capped at
    ~5.6 GB / 16k slots so a proposal + commit never approaches the v5e's
    16 GB — a previous [B,A,3,3] OOM took the TPU worker down for half an
    hour)."""
    ok = (flags.polarization and flags.polar_mixed and
          not flags.polar_ewald_full and
          not (flags.polarvdw or flags.using_axilrod_teller or
               flags.rd_crystal or flags.gwp or flags.spectre or
               flags.rd_anharmonic))
    if n_atom_slots and n_atom_slots > 16384:
        return False
    return ok


def cache_init(state: SystemState, flags: FFlags, params: RunParams,
               block: int = 128) -> PolarCache:
    """Full O(A^2) build (once at chain start / every corrtime refresh)."""
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
        co, cd = polar_mod.mixed_coeff_scalars(state, pt, flags, params)
        f = polar_mod.field_scalars(state, pt, flags, params)
        e = rows_field(f, state.charge, pt.dimg)
        d32 = pt.dimg.astype(jnp.float32)
        planes = polar_mod.fold_outer_rows(co, cd, d32[..., 0],
                                           d32[..., 1], d32[..., 2], flags)
        return None, (planes, e)

    _, (planes, e) = jax.lax.scan(body, None, jnp.arange(nb))
    planes = tuple(assemble_tiles(p, A, block) for p in planes)
    z0 = jnp.zeros((0, 0), jnp.float32)
    if len(planes) == 3:       # exponential damping: in-kernel coefficients
        co, cd = z0, z0
        dx, dy, dz = planes
    elif len(planes) == 4:     # linear/off: co folded into s = sqrt(-co) d
        co = z0
        cd, dx, dy, dz = planes
    else:                      # polar_wolf_full: sign-indefinite c_outer
        co, cd, dx, dy, dz = planes
    e = assemble_tiles(e, A, block)

    if flags.polar_ewald:
        k, _ = kvectors(state, flags.ewald_kmax)
        phase = phase_dot(state.pos, k)               # [A,K]
        cos64, sin64 = jnp.cos(phase), jnp.sin(phase)
        q = jnp.where(state.atom_alive(), state.charge, 0.0)
        f1, f2 = q @ cos64, q @ sin64
        cosp = cos64.astype(jnp.float32)
        sinp = sin64.astype(jnp.float32)
    else:
        cosp = jnp.zeros((A, 0), jnp.float32)
        sinp = jnp.zeros((A, 0), jnp.float32)
        f1 = jnp.zeros(0)
        f2 = jnp.zeros(0)
    return PolarCache(co, cd, dx, dy, dz, e, cosp, sinp, f1, f2)


def recip_field(state: SystemState, flags: FFlags, params: RunParams,
                cache: PolarCache):
    """k-space static field from the cached phases — the float32 cut of
    ops.polar.recip_term (src/System.Energy.cpp:2834-2896)."""
    ea = params.polar_ewald_alpha
    k, k2 = kvectors(state, flags.ewald_kmax)
    kw = (k / k2[:, None] * jnp.exp(-k2 / (4.0 * ea * ea))[:, None])
    coeff = (cache.sinp * cache.f1.astype(jnp.float32)[None, :] -
             cache.cosp * cache.f2.astype(jnp.float32)[None, :])
    E = jnp.matmul(coeff, kw.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST).astype(jnp.float64)
    return E * 8.0 * const.pi / state.pbc.volume


def static_field(state: SystemState, flags: FFlags, params: RunParams,
                 cache: PolarCache):
    E = cache.e_pair
    if flags.polar_ewald:
        E = E + recip_field(state, flags, params, cache)
    return jnp.where(state.atom_alive()[:, None], E, 0.0)


def write_symmetric_rows(plane, rows_plane, start, valid, sign: float):
    """Commit an S-row update window into a symmetric (sign=+1) or
    antisymmetric (sign=-1) [A,A] plane, writing the row strip directly
    and the matching column strip via the symmetry invariant
    ``plane[:, start+s] == sign * plane[start+s, :]``.

    Every plane access here is a contiguous ROW slice or a single-column
    [A,1] update — two TPU-layout landmines lurk otherwise: (a) a column
    dynamic_slice (or an [S,A]-slice transpose, which XLA's simplifier
    rewrites into a column slice of a transposed plane) materialises a
    full layout-converted ~480 MB copy of the plane (~1.5 ms); (b) an
    [A,S>1] column dynamic_update_slice makes layout assignment flip part
    of the plane's use chain to {0,1} while the Pallas SCF kernel needs
    {1,0}, again forcing full-plane copies.  Rows whose ``valid`` entry
    is False re-write their current content (a semantic no-op)."""
    A = plane.shape[0]
    S = rows_plane.shape[0]
    z = jnp.zeros((), jnp.int32)
    cur = jax.lax.dynamic_slice(plane, (start, z), (S, A))
    blend = jnp.where(valid[:, None], rows_plane, cur)
    plane = jax.lax.dynamic_update_slice(plane, blend, (start, z))
    cols = []
    for s in range(S):
        _s = jnp.asarray(s, jnp.int32)
        # desired column start+s: sign*blend[s] where the column is valid,
        # else its current content == sign*cur[s] away from the window
        # with the window rows patched to the row-write values
        colv = sign * jnp.where(valid[s], blend[s], cur[s])        # [A]
        win_cur = jax.lax.dynamic_slice(
            blend, (z, start + _s), (S, 1))[:, 0]                  # [S]
        win_val = jax.lax.dynamic_slice(colv, (start,), (S,))
        patch = jnp.where(valid[s], win_val, win_cur)
        cols.append(jax.lax.dynamic_update_slice(colv, patch, (start,)))
    from . import pallas_polar
    if jax.default_backend() not in ("cpu",) and \
            pallas_polar.col_write_supported(A, S):
        # one streaming pass writes all S adjacent columns; S separate
        # [A,1] updates each RMW the same 128-lane tile band
        return pallas_polar.write_columns_pallas(
            plane, jnp.stack(cols, axis=1), start)
    for s in range(S):
        plane = jax.lax.dynamic_update_slice(
            plane, cols[s][:, None], (z, start + jnp.asarray(s, jnp.int32)))
    return plane


def cache_move(cache: PolarCache, old_state: SystemState,
               new_state: SystemState, rows, flags: FFlags,
               params: RunParams) -> PolarCache:
    """O(S*A) cache update for a move that changed only ``rows`` atoms
    (positions and/or their molecule's aliveness).  Padded entries are -1.

    Contract: the valid entries of ``rows`` are an ascending contiguous
    range starting at ``rows[0]`` (molecule atoms are contiguous in
    build_state file order, and the chain's rows_of gathers preserve
    that) — the plane updates are dynamic_update_slice blocks, which XLA
    performs in place on TPU where a gather-scatter would copy the full
    [A,A] plane.
    """
    A = old_state.n_atom_slots
    S_w = rows.shape[0]
    # normalise to WINDOW coordinates: the update window is the S
    # contiguous plane rows starting at min(rows[0], A-S), so every row
    # read is one dynamic_slice and every write one dynamic_update_slice
    # (dynamic gathers/scatters lower to serial while loops on TPU).
    start_w, rows, valid = normalize_window(rows, A)

    def rows_of(arr):
        return slice_rows(arr, start_w, S_w)

    pt_old = build_pairs_rect(old_state, flags, rows)
    pt_new = build_pairs_rect(new_state, flags, rows)

    # --- pairwise static field -------------------------------------------
    f_old = polar_mod.field_scalars(old_state, pt_old, flags, params)
    f_new = polar_mod.field_scalars(new_state, pt_new, flags, params)
    q_rows_old = jnp.where(valid, rows_of(old_state.charge), 0.0)
    q_rows_new = jnp.where(valid, rows_of(new_state.charge), 0.0)
    # field sourced by the moved atoms, at every atom: f symmetric,
    # d antisymmetric, so E_j += -f_sj q_s d_sj summed over s
    C_old = -contract_small_rows(f_old, q_rows_old, pt_old.dimg)
    C_new = -contract_small_rows(f_new, q_rows_new, pt_new.dimg)
    e = cache.e_pair + (C_new - C_old)
    # the moved rows' own field changed wholesale: recompute outright
    # (contiguous-row dynamic_update_slice, see upd_plane below)
    E_rows = rows_field(f_new, new_state.charge, pt_new.dimg)
    _start = start_w
    _z = jnp.zeros((), jnp.int32)
    _cur_e = jax.lax.dynamic_slice(e, (_start, _z), (S_w, 3))
    e = jax.lax.dynamic_update_slice(
        e, jnp.where(valid[:, None], E_rows, _cur_e), (_start, _z))

    # --- contraction coefficients (rows exact, columns by symmetry) ------
    co_rows, cd_rows = polar_mod.mixed_coeff_scalars(new_state, pt_new,
                                                     flags, params)
    d32 = pt_new.dimg.astype(jnp.float32)
    rowp = polar_mod.fold_outer_rows(co_rows, cd_rows, d32[..., 0],
                                     d32[..., 1], d32[..., 2], flags)

    # Molecule atoms are contiguous (build_state file order; the chain's
    # rows_of gathers preserve that), so the plane updates are
    # dynamic_update_slice blocks at rows[0] — XLA updates those IN PLACE,
    # whereas a gather-index scatter on a [A,A] plane materialises a full
    # 420 MB copy per plane on TPU (measured: 17 ms/commit -> ~1 ms).
    # Padded (-1) tail rows re-write current content via a blend.
    S = S_w
    start = start_w
    z = jnp.zeros((), jnp.int32)

    co, cd = cache.co, cache.cd            # [0,0] placeholders, untouched
    if len(rowp) == 3:
        sx_rows, sy_rows, sz_rows = rowp
    elif len(rowp) == 4:
        cd_rows, sx_rows, sy_rows, sz_rows = rowp
        cd = write_symmetric_rows(cache.cd, cd_rows, start, valid, 1.0)
    else:
        co_rows, cd_rows, sx_rows, sy_rows, sz_rows = rowp
        co = write_symmetric_rows(cache.co, co_rows, start, valid, 1.0)
        cd = write_symmetric_rows(cache.cd, cd_rows, start, valid, 1.0)
    # masked d and s = sqrt(-co) d inherit d's antisymmetry (sign=-1)
    dx = write_symmetric_rows(cache.dx, sx_rows, start, valid, -1.0)
    dy = write_symmetric_rows(cache.dy, sy_rows, start, valid, -1.0)
    dz = write_symmetric_rows(cache.dz, sz_rows, start, valid, -1.0)

    # --- k-space phases / charge structure factors -----------------------
    if flags.polar_ewald:
        k, _ = kvectors(new_state, flags.ewald_kmax)
        ph_old = phase_dot(rows_of(old_state.pos), k)
        ph_new = phase_dot(rows_of(new_state.pos), k)
        cos_o, sin_o = jnp.cos(ph_old), jnp.sin(ph_old)
        cos_n, sin_n = jnp.cos(ph_new), jnp.sin(ph_new)
        qo = jnp.where(valid & rows_of(old_state.atom_alive()),
                       rows_of(old_state.charge), 0.0)
        qn = jnp.where(valid & rows_of(new_state.atom_alive()),
                       rows_of(new_state.charge), 0.0)
        f1 = cache.f1 - sum_small_rows(qo, cos_o) + sum_small_rows(qn, cos_n)
        f2 = cache.f2 - sum_small_rows(qo, sin_o) + sum_small_rows(qn, sin_n)

        def upd_phase(plane, vals):
            K = plane.shape[1]
            cur = jax.lax.dynamic_slice(plane, (start, z), (S, K))
            blend = jnp.where(valid[:, None], vals.astype(jnp.float32), cur)
            return jax.lax.dynamic_update_slice(plane, blend, (start, z))

        cosp = upd_phase(cache.cosp, cos_n)
        sinp = upd_phase(cache.sinp, sin_n)
    else:
        cosp, sinp, f1, f2 = cache.cosp, cache.sinp, cache.f1, cache.f2

    return PolarCache(co, cd, dx, dy, dz, e, cosp, sinp, f1, f2)


class CommitData(NamedTuple):
    """Everything ``cache_commit`` needs to update the cache for an
    ACCEPTED move, captured from ``polar_proposal``'s own intermediates so
    the commit re-runs no geometry (no pair build, no erfc/erf, no
    damping) — those were ~2.5 ms/move of duplicated work at 10k atoms."""
    start: jnp.ndarray    # window start (i32)
    valid: jnp.ndarray    # [S] bool
    e_pair: jnp.ndarray   # [A,3] f64 pairwise static field (no recip)
    co: jnp.ndarray       # [S,A] f32 row blocks in the cache's
    cd: jnp.ndarray       # fold_outer_rows representation (co and/or cd
    dx: jnp.ndarray       # are [0,0] placeholders per planes_of; dx/dy/dz
    dy: jnp.ndarray       # hold masked d or s = sqrt(-co) d rows);
    dz: jnp.ndarray       # invalid rows zeroed
    f1: jnp.ndarray       # [K] f64 updated structure factors
    f2: jnp.ndarray
    cosp: jnp.ndarray     # [S,K] f64 new-row phases
    sinp: jnp.ndarray


def polar_proposal(cache: PolarCache, old_state: SystemState,
                   new_state: SystemState, rows, flags: FFlags,
                   params: RunParams, with_commit: bool = False):
    """Polarization energy of a PROPOSED move without materialising an
    updated cache.

    The cache differs from the proposal's coefficient set only in the
    moved rows/columns, so each SCF iteration contracts against the
    unmodified cache and applies O(S*A) row/column corrections.  This
    keeps the big planes read-only inside the MC step — the commit
    (cache_commit with the captured CommitData, or cache_move on the
    accepted state) is then free to scatter in place, instead of
    copying + tree-selecting ~2 GB per move at 10k atoms.

    With ``with_commit`` returns ``(PolarResult, CommitData)``.
    """
    A = old_state.n_atom_slots
    S = rows.shape[0]
    start, rows, valid = normalize_window(rows, A)

    def rows_of(arr):
        return slice_rows(arr, start, S)

    in_R = update_rows(jnp.zeros(A, bool), start, valid)

    pt_old = build_pairs_rect(old_state, flags, rows)
    pt_new = build_pairs_rect(new_state, flags, rows)

    # --- proposal's static field (all [A,3]-small outputs) ----------------
    f_old = polar_mod.field_scalars(old_state, pt_old, flags, params)
    f_new = polar_mod.field_scalars(new_state, pt_new, flags, params)
    q_ro = jnp.where(valid, rows_of(old_state.charge), 0.0)
    q_rn = jnp.where(valid, rows_of(new_state.charge), 0.0)
    C_old = -contract_small_rows(f_old, q_ro, pt_old.dimg)
    C_new = -contract_small_rows(f_new, q_rn, pt_new.dimg)
    e = cache.e_pair + (C_new - C_old)
    E_rows = rows_field(f_new, new_state.charge, pt_new.dimg)
    e = update_rows(e, start, E_rows, valid)
    e_pair_new = e

    if flags.polar_ewald:
        k, _ = kvectors(new_state, flags.ewald_kmax)
        ea = params.polar_ewald_alpha
        _, k2 = kvectors(new_state, flags.ewald_kmax)
        kw = (k / k2[:, None] * jnp.exp(-k2 / (4.0 * ea * ea))[:, None])
        ph_old = phase_dot(rows_of(old_state.pos), k)
        ph_new = phase_dot(rows_of(new_state.pos), k)
        cos_o, sin_o = jnp.cos(ph_old), jnp.sin(ph_old)
        cos_n, sin_n = jnp.cos(ph_new), jnp.sin(ph_new)
        qo = jnp.where(valid & rows_of(old_state.atom_alive()),
                       rows_of(old_state.charge), 0.0)
        qn = jnp.where(valid & rows_of(new_state.atom_alive()),
                       rows_of(new_state.charge), 0.0)
        f1 = cache.f1 - sum_small_rows(qo, cos_o) + sum_small_rows(qn, cos_n)
        f2 = cache.f2 - sum_small_rows(qo, sin_o) + sum_small_rows(qn, sin_n)
        hi = jax.lax.Precision.HIGHEST
        coeff = (cache.sinp * f1.astype(jnp.float32)[None, :] -
                 cache.cosp * f2.astype(jnp.float32)[None, :])
        E_recip = jnp.matmul(coeff, kw.astype(jnp.float32),
                             precision=hi).astype(jnp.float64)
        # the moved rows' phases changed: fix their recip field directly
        row_coeff = sin_n * f1[None, :] - cos_n * f2[None, :]
        E_recip = update_rows(
            E_recip, start,
            jnp.sum(row_coeff[..., None] * kw[None], axis=1), valid)
        e = e + E_recip * 8.0 * const.pi / new_state.pbc.volume
    else:
        f1, f2 = cache.f1, cache.f2
        cos_n = jnp.zeros((S, 0))
        sin_n = jnp.zeros((S, 0))
    E_static = jnp.where(new_state.atom_alive()[:, None], e, 0.0)

    # --- row blocks, new (from geometry) and old (gathered from cache) ---
    # both sides live in the cache's folded representation
    # (ops.polar.fold_outer_rows): 4 row blocks in the common case
    co_n, cd_n = polar_mod.mixed_coeff_scalars(new_state, pt_new, flags,
                                               params)
    d_n = pt_new.dimg.astype(jnp.float32)
    vm = valid[:, None]
    rows_new = tuple(jnp.where(vm, p, 0.0) for p in polar_mod.fold_outer_rows(
        co_n, cd_n, d_n[..., 0], d_n[..., 1], d_n[..., 2], flags))
    rows_old = tuple(jnp.where(vm, rows_of(p), 0.0)
                     for p in planes_of(cache))

    l32 = jnp.float32(params.polar_damp)

    def expand_blocks(blocks):
        # (co, cd, dx, dy, dz) of a row-block tuple in any of the three
        # fold_outer_rows representations; mode 3 recomputes the
        # coefficients from the masked displacements (invalid rows are
        # d == 0, so their coefficients vanish exactly as before)
        if len(blocks) == 3:
            dxb, dyb, dzb = blocks
            co_b, cd_b = polar_mod.coeffs_from_d(dxb, dyb, dzb, l32)
        else:
            co_b = blocks[0] if len(blocks) == 5 else None
            cd_b, dxb, dyb, dzb = blocks[-4:]
        return co_b, cd_b, dxb, dyb, dzb

    def contract_fn(m):
        base = polar_mod.contract_mixed(planes_of(cache), m,
                                        l=params.polar_damp)
        m32 = m.astype(jnp.float32)
        mx = m32[:, 0][None, :]
        my = m32[:, 1][None, :]
        mz = m32[:, 2][None, :]
        mu_r = jnp.where(vm, rows_of(m32), 0.0)              # [S,3]

        def row_ef(blocks):
            # field AT the row atoms from everyone: -(sum_j M_sj mu_j)
            co_b, cd_b, dxb, dyb, dzb = expand_blocks(blocks)
            dot = dxb * mx + dyb * my + dzb * mz
            s = -dot if co_b is None else co_b * dot
            ex = jnp.sum(s * dxb + cd_b * mx, axis=1)
            ey = jnp.sum(s * dyb + cd_b * my, axis=1)
            ez = jnp.sum(s * dzb + cd_b * mz, axis=1)
            return -jnp.stack([ex, ey, ez], 1).astype(jnp.float64)

        def col_ef(blocks):
            # field AT every atom i sourced by the row atoms j in R:
            # co/cd symmetric, d (and s = sqrt(-co) d) antisymmetric
            # entering quadratically, so the double flip cancels and the
            # row-block arrays serve directly (dot uses mu_j of the ROW
            # atom)
            co_b, cd_b, dxb, dyb, dzb = expand_blocks(blocks)
            dot = (dxb * mu_r[:, 0:1] + dyb * mu_r[:, 1:2] +
                   dzb * mu_r[:, 2:3])                        # [S,A]
            s = -dot if co_b is None else co_b * dot
            gx = jnp.sum(s * dxb + cd_b * mu_r[:, 0:1], axis=0)
            gy = jnp.sum(s * dyb + cd_b * mu_r[:, 1:2], axis=0)
            gz = jnp.sum(s * dzb + cd_b * mu_r[:, 2:3], axis=0)
            return -jnp.stack([gx, gy, gz], 1).astype(jnp.float64)

        col_corr = col_ef(rows_new) - col_ef(rows_old)
        # pairs with i in R belong to the wholesale row replacement below
        ef = base + jnp.where(in_R[:, None], 0.0, col_corr)
        return update_rows(ef, start, row_ef(rows_new), valid)

    res = polar_mod.finish_polar(new_state, flags, params, E_static,
                                 contract_fn)
    if not with_commit:
        return res
    z0 = jnp.zeros((0, 0), jnp.float32)
    if len(rows_new) == 3:
        co_r, cd_r = z0, z0
        sx_r, sy_r, sz_r = rows_new
    elif len(rows_new) == 4:
        co_r = z0
        cd_r, sx_r, sy_r, sz_r = rows_new
    else:
        co_r, cd_r, sx_r, sy_r, sz_r = rows_new
    cdata = CommitData(start=start, valid=valid, e_pair=e_pair_new,
                       co=co_r, cd=cd_r, dx=sx_r, dy=sy_r, dz=sz_r,
                       f1=f1, f2=f2, cosp=cos_n, sinp=sin_n)
    return res, cdata


def cache_commit(cache: PolarCache, accept, cdata: CommitData,
                 flags: FFlags) -> PolarCache:
    """Commit a proposal's CommitData into the cache: the accepted-move
    equivalent of ``cache_move`` with zero geometry recomputation (no
    pair build / erfc / damping — everything was already computed by
    ``polar_proposal(with_commit=True)`` on the same states).  On reject
    every write re-writes current content, a semantic no-op, so the
    commit is safe to run unconditionally after the Metropolis decision
    (a lax.cond on the carried [A,A] planes would block XLA's in-place
    aliasing and copy ~2 GB per move)."""
    S = cdata.valid.shape[0]
    start = cdata.start
    z = jnp.zeros((), jnp.int32)
    ok = accept & cdata.valid                      # [S]
    e = jnp.where(accept, cdata.e_pair, cache.e_pair)
    if cache.co.size:          # polar_wolf_full: unfolded co plane present
        co = write_symmetric_rows(cache.co, cdata.co, start, ok, 1.0)
    else:
        co = cache.co
    if cache.cd.size:          # 3-plane mode has no cd plane either
        cd = write_symmetric_rows(cache.cd, cdata.cd, start, ok, 1.0)
    else:
        cd = cache.cd
    dx = write_symmetric_rows(cache.dx, cdata.dx, start, ok, -1.0)
    dy = write_symmetric_rows(cache.dy, cdata.dy, start, ok, -1.0)
    dz = write_symmetric_rows(cache.dz, cdata.dz, start, ok, -1.0)
    if flags.polar_ewald:
        f1 = jnp.where(accept, cdata.f1, cache.f1)
        f2 = jnp.where(accept, cdata.f2, cache.f2)

        def commit_phase(plane, vals):
            K = plane.shape[1]
            cur = jax.lax.dynamic_slice(plane, (start, z), (S, K))
            blend = jnp.where(ok[:, None], vals.astype(jnp.float32), cur)
            return jax.lax.dynamic_update_slice(plane, blend, (start, z))

        cosp = commit_phase(cache.cosp, cdata.cosp)
        sinp = commit_phase(cache.sinp, cdata.sinp)
    else:
        cosp, sinp, f1, f2 = cache.cosp, cache.sinp, cache.f1, cache.f2
    return PolarCache(co, cd, dx, dy, dz, e, cosp, sinp, f1, f2)


def polar_from_cache(state: SystemState, cache: PolarCache, flags: FFlags,
                     params: RunParams) -> polar_mod.PolarResult:
    """Polarization energy with all mu-independent work cached: the same
    SCF as ops.polar.polar_blocked, minus the O(A^2) setup."""
    E_static = static_field(state, flags, params, cache)

    def contract_fn(m):
        return polar_mod.contract_mixed(planes_of(cache), m,
                                        l=params.polar_damp)

    return polar_mod.finish_polar(state, flags, params, E_static,
                                  contract_fn)
