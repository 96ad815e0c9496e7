"""Pair geometry, exclusion masks, and LJ mixing rules.

The reference maintains per-pair caches in linked ``Pair`` nodes
(src/Pair.h:18-98) updated incrementally (src/System.Pairs.cpp,
src/System.cpp:953-1279).  On TPU we recompute pair quantities as dense
batched tensor math: masks and mixed parameters are cheap elementwise
functions of per-atom parameters, fully fused by XLA into the energy
kernels.

Two layouts share one code path:
* dense [A,A]: all pairs, counted once via the upper triangle — the full
  energy.
* rect [S,A]: the S atom slots of one molecule against all atoms — the
  O(S*A) slice used by incremental Delta-E move evaluation (ops/delta.py),
  replacing the reference's ``recalculate_energy`` pair-cache trick with
  something the TPU actually likes.

``pair_once`` marks each physical pair exactly once in either layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import constants as const
from ..flags import FFlags
from ..pbc import _mul3, minimum_image_disp
from ..state import SystemState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairTensors:
    """Pair quantities; leading dim is A (dense) or S (rect rows).

    Row sets are CONTIGUOUS windows: every valid entry satisfies
    rows[k] == start + k (chain/PI topology gathers, window-normalised
    cache rows, sharded row slices and blocked tiles all guarantee this).
    Row reads are therefore single ``dynamic_slice`` ops — a dynamic
    gather of the same rows lowers to a serial while loop per gather on
    TPU, at ~60 us of loop overhead each (profiled r3: ~190 such loops
    cost 12 ms/move on the multi-site flagship)."""

    dimg: jnp.ndarray         # [R,A,3] minimum-image displacement r_i - r_j
    rimg: jnp.ndarray         # [R,A] minimum-image distance
    r: jnp.ndarray            # [R,A] real (unwrapped) distance
    pair_once: jnp.ndarray    # [R,A] bool: count this pair here (and alive)
    alive: jnp.ndarray        # [R,A] bool both atoms' molecules alive
    same_mol: jnp.ndarray     # [R,A] bool
    frozen: jnp.ndarray       # [R,A] bool frozen_i && frozen_j
    rd_excluded: jnp.ndarray  # [R,A] bool
    es_excluded: jnp.ndarray  # [R,A] bool
    sigma: jnp.ndarray        # [R,A] mixed
    epsilon: jnp.ndarray      # [R,A] mixed
    attractive_only: jnp.ndarray  # [R,A] bool
    sigrep: jnp.ndarray       # [R,A] (cdvdw_sig_repulsion)
    c6: jnp.ndarray           # [R,A] mixed dispersion coeffs (K*Angstrom^n)
    c8: jnp.ndarray
    c10: jnp.ndarray
    rows: Optional[jnp.ndarray] = None  # [R] atom indices (rect) or None
    row_start: Optional[jnp.ndarray] = None  # window start (contiguous rows)

    def row(self, arr):
        """Slice a per-atom array onto the row axis."""
        if self.rows is None:
            return arr
        if self.row_start is not None:
            return slice_rows(arr, self.row_start, self.rows.shape[0])
        return arr[jnp.clip(self.rows, 0, arr.shape[0] - 1)]


def window_start(rows, A: int):
    """Start of the contiguous row window: rows[k] == start + k for every
    valid (>= 0) entry; clipped so the window stays in bounds."""
    S = rows.shape[0]
    off = jnp.arange(S, dtype=jnp.int32)
    start = jnp.max(jnp.where(rows >= 0, rows.astype(jnp.int32) - off, -1))
    return jnp.clip(start, 0, max(A - S, 0))


def normalize_window(rows, A: int):
    """Re-index a contiguous-run row set into its clipped S-window:
    returns ``(start, rows_w, valid_w)`` with rows_w[k] == start + k and
    valid_w marking which window rows are real moved rows.  When the
    natural window would overrun the array end the clip shifts it down;
    the validity run shifts with it.  Idempotent (valid entries may sit
    at any contiguous run inside ``rows``)."""
    S = rows.shape[0]
    start = window_start(rows, A)
    if S == 1:
        return start, rows, rows >= 0
    arange = jnp.arange(S, dtype=jnp.int32)
    first_valid = jnp.min(jnp.where(rows >= 0, rows.astype(jnp.int32), A))
    nvalid = jnp.sum(rows >= 0).astype(jnp.int32)
    offset = first_valid - start
    valid_w = (arange >= offset) & (arange < offset + nvalid)
    return start, jnp.where(valid_w, start + arange, -1), valid_w


def phase_dot(pos, k):
    """``pos[...,3] @ k[K,3].T`` with the size-3 contraction unrolled —
    a dot_general contracting a length-3 axis lowers to a serial while
    loop on TPU (~60 us overhead per instance in the MC hot path).
    Delegates to pbc._mul3, the one shared unrolled implementation."""
    return _mul3(pos, k.T)


def sum_small_rows(w, m):
    """``w[S] @ m[S, ...]`` for small static S, unrolled to fused
    multiply-adds (same serialization hazard as phase_dot)."""
    out = w[0] * m[0]
    for s in range(1, m.shape[0]):
        out = out + w[s] * m[s]
    return out


def contract_small_rows(f, q, d):
    """``einsum('sj,s,sjp->jp', f, q, d)`` for small static S, unrolled."""
    out = (f[0] * q[0])[:, None] * d[0]
    for s in range(1, f.shape[0]):
        out = out + (f[s] * q[s])[:, None] * d[s]
    return out


def rows_field(f, qj, d):
    """``einsum('sj,j,sjp->sp', f, qj, d)`` via elementwise + reduce (a
    [S,3]-output dot_general also serializes)."""
    t = f * qj[None, :]
    return jnp.sum(t[..., None] * d, axis=1)


def tile_starts(A: int, block: int):
    """Static tile starts covering [0,A) with fully in-bounds windows;
    the last tile shifts down to end exactly at A (its overlap rows
    recompute identical data).  Use with ``assemble_tiles`` for scans
    that WRITE per-row tensors — a -1-padded tail tile would have its
    window shifted by the row normalisation and break positional
    reassembly.  (Scans that only SUM over pair_once keep -1 padding:
    overlapping windows would double-count pairs.)"""
    nb = -(-A // block)
    return [min(b * block, max(A - block, 0)) for b in range(nb)]


def assemble_tiles(tiles, A: int, block: int):
    """[nb, block, ...] tile stack -> [A, ...] honoring tile_starts."""
    nb = tiles.shape[0]
    flat = (nb * block,) + tiles.shape[2:]
    if nb * block == A:
        return tiles.reshape(flat)
    if A <= block:
        return tiles.reshape(flat)[:A]
    head = tiles[:-1].reshape(((nb - 1) * block,) + tiles.shape[2:])
    tail = tiles[-1][block - (A - (nb - 1) * block):]
    return jnp.concatenate([head, tail], axis=0)


def slice_rows(arr, start, S: int):
    """Contiguous S-row slice along axis 0 via one dynamic_slice.

    Falls back to a clip-gather when the window is wider than the array
    (block tiles on systems smaller than the block size)."""
    start = start.astype(jnp.int32)
    if S > arr.shape[0]:
        return arr[jnp.clip(start + jnp.arange(S), 0, arr.shape[0] - 1)]
    starts = (start,) + (start * 0,) * (arr.ndim - 1)
    return jax.lax.dynamic_slice(arr, starts, (S,) + arr.shape[1:])


def update_rows(arr, start, block, valid=None):
    """Write a contiguous row block in place (dynamic_update_slice);
    ``valid`` masks rows that must keep their current contents."""
    start = start.astype(jnp.int32)
    S = block.shape[0]
    if valid is not None:
        cur = slice_rows(arr, start, S)
        vm = valid.reshape((S,) + (1,) * (arr.ndim - 1))
        block = jnp.where(vm, block, cur)
    if S > arr.shape[0]:
        idx = jnp.clip(start + jnp.arange(S), 0, arr.shape[0] - 1)
        sel = (start + jnp.arange(S)) < arr.shape[0]
        return arr.at[jnp.where(sel, idx, arr.shape[0])].set(
            block.astype(arr.dtype), mode="drop")
    starts = (start,) + (start * 0,) * (arr.ndim - 1)
    return jax.lax.dynamic_update_slice(arr, block.astype(arr.dtype), starts)


def mix_lj(flags: FFlags, eps_i, eps_j, sig_i, sig_j, w_i, w_j, a_i, a_j,
           c6_i, c6_j, c8_i, c8_j, c10_i, c10_j):
    """LJ/Buckingham mixing rules (src/System.cpp:1070-1177).

    Inputs broadcast; returns (sigma, epsilon, attractive_only, sigrep,
    c6, c8, c10).
    """
    zero = jnp.zeros(jnp.broadcast_shapes(jnp.shape(eps_i), jnp.shape(eps_j)))
    sigrep = zero
    c6m = zero
    c8m = zero
    c10m = zero
    attractive_only = (sig_i < 0.0) | (sig_j < 0.0)

    if flags.use_sg:
        return zero, zero, attractive_only, sigrep, c6m, c8m, c10m

    if flags.waldmanhagler and not flags.cdvdw_sig_repulsion:
        si3 = sig_i ** 3
        si6 = si3 * si3
        sj3 = sig_j ** 3
        sj6 = sj3 * sj3
        sig_zero = (sig_i == 0.0) | (sig_j == 0.0)
        sigma = jnp.where(sig_zero & ~attractive_only, 0.0,
                          (0.5 * (si6 + sj6)) ** (1.0 / 6.0))
        eps_wh = jnp.sqrt(eps_i * eps_j) * 2.0 * si3 * sj3 / jnp.where(
            si6 + sj6 == 0.0, 1.0, si6 + sj6)
        epsilon = jnp.where(sig_zero, jnp.sqrt(eps_i * eps_j), eps_wh)
        # reference quirk: the attractive-only branch never assigns
        # epsilon (src/System.cpp:1081-1083); fresh calloc'd Pair nodes
        # keep 0, so attractive-only pairs contribute zero energy
        epsilon = jnp.where(attractive_only & ~sig_zero, 0.0, epsilon)
    elif flags.halgren_mixing:
        s2 = sig_i * sig_i + sig_j * sig_j
        sigma = jnp.where((sig_i > 0) & (sig_j > 0),
                          (sig_i ** 3 + sig_j ** 3) / jnp.where(s2 == 0, 1.0, s2),
                          0.0)
        se = jnp.sqrt(eps_i) + jnp.sqrt(eps_j)
        epsilon = jnp.where((eps_i > 0) & (eps_j > 0),
                            4 * eps_i * eps_j / jnp.where(se == 0, 1.0, se ** 2),
                            0.0)
    elif flags.cdvdw_9th_repulsion:
        si6 = sig_i ** 6
        sj6 = sig_j ** 6
        repul1 = 4.0 * si6 * si6 * eps_i
        repul2 = 4.0 * sj6 * sj6 * eps_j
        repulmix = (0.5 * (repul1 ** (1. / 9.) + repul2 ** (1. / 9.))) ** 9
        sigma = jnp.ones_like(zero)
        epsilon = repulmix / 4.0
    elif flags.cdvdw_sig_repulsion:
        si6 = sig_i ** 6
        sj6 = sig_j ** 6
        sigma = (0.5 * (si6 + sj6)) ** (1. / 6.)
        sig6 = sigma ** 6
        sigrep = (1.5 * const.hBar / const.kB * const.au2invseconds *
                  w_i * w_j * a_i * a_j /
                  jnp.where(w_i + w_j == 0, 1.0, w_i + w_j) /
                  jnp.where(sig6 == 0, 1.0, sig6))
        epsilon = jnp.sqrt(eps_i * eps_j)
    elif flags.cdvdw_exp_repulsion:
        # buckingham: sigma == C, epsilon == rho; U = C exp(-R/(2 rho))
        esum = eps_i + eps_j
        sigma = (jnp.abs(sig_i) ** eps_i * jnp.abs(sig_j) ** eps_j) ** (
            1.0 / jnp.where(esum == 0, 1.0, esum))
        epsilon = 0.5 * esum
    elif flags.using_disp_expansion:
        # sigma == r, epsilon == alpha; U = C exp(-alpha(R-r)), C ~= 316 K
        sigma = 0.5 * (sig_i + sig_j)
        esum = eps_i + eps_j
        epsilon = 2.0 * eps_i * eps_j / jnp.where(esum == 0, 1.0, esum)
        if flags.schmidt_ff:
            e2 = eps_i * eps_i + eps_j * eps_j
            epsilon = esum * eps_i * eps_j / jnp.where(e2 == 0, 1.0, e2)
        # a.u. -> K*Angstrom^n conversions (src/System.cpp:1149-1157)
        c6m = jnp.sqrt(c6_i * c6_j) * 0.021958709 / (3.166811429e-6)
        c8m = jnp.sqrt(c8_i * c8_j) * 0.0061490647 / (3.166811429e-6)
        if flags.extrapolate_disp_coeffs:
            c10m = jnp.where((c6m != 0.0) & (c8m != 0.0),
                             49.0 / 40.0 * c8m * c8m /
                             jnp.where(c6m == 0, 1.0, c6m),
                             0.0)
        else:
            c10m = jnp.sqrt(c10_i * c10_j) * 0.0017219135 / (3.166811429e-6)
    elif flags.c6_mixing:
        sigma = 0.5 * (sig_i + sig_j)
        ssum6 = (sig_i + sig_j) ** 6
        epsilon = jnp.where(
            sigma != 0.0,
            64.0 * jnp.sqrt(eps_i * eps_j) * (sig_i ** 3) * (sig_j ** 3) /
            jnp.where(ssum6 == 0, 1.0, ssum6),
            0.0)
    else:  # lorentz-berthelot (src/System.cpp:1166-1177)
        sig_zero = (sig_i == 0.0) | (sig_j == 0.0)
        sigma = jnp.where(attractive_only,
                          0.5 * (jnp.abs(sig_i) + jnp.abs(sig_j)),
                          jnp.where(sig_zero, 0.0, 0.5 * (sig_i + sig_j)))
        # same quirk as WH: epsilon unassigned (-> 0) for attractive-only
        # pairs (src/System.cpp:1167-1169)
        epsilon = jnp.where(attractive_only, 0.0, jnp.sqrt(eps_i * eps_j))

    return sigma, epsilon, attractive_only, sigrep, c6m, c8m, c10m


def _build(state: SystemState, flags: FFlags, rows,
           block_global: bool = False) -> PairTensors:
    A = state.n_atom_slots
    if rows is None:
        g = lambda arr: arr
        pos_r = state.pos
        row_valid = jnp.ones(A, dtype=bool)
        row_start = None
    else:
        S = rows.shape[0]
        if S > A:
            # window wider than the array: legacy clip-gather semantics
            safe_g = jnp.clip(rows, 0, A - 1)
            g = lambda arr: arr[safe_g]
            pos_r = g(state.pos)
            row_valid = rows >= 0
            row_start = None
        else:
            row_start, rows, row_valid = normalize_window(rows, A)
            g = lambda arr: slice_rows(arr, row_start, S)
            pos_r = g(state.pos)

    d = pos_r[:, None, :] - state.pos[None, :, :]
    dimg, rimg = minimum_image_disp(d, state.pbc.basis, state.pbc.reciprocal)
    r = jnp.linalg.norm(d, axis=-1)
    # NaN-guard mirror of src/System.cpp:1265-1270: bad image -> use real
    bad = ~jnp.isfinite(rimg)
    rimg = jnp.where(bad, r, rimg)
    dimg = jnp.where(bad[..., None], d, dimg)

    atom_alive = state.atom_alive()
    alive = (g(atom_alive) & row_valid)[:, None] & atom_alive[None, :]
    same_mol = g(state.mol_id)[:, None] == state.mol_id[None, :]
    frozen = g(state.frozen)[:, None] & state.frozen[None, :]

    eps_i, eps_j = g(state.epsilon)[:, None], state.epsilon[None, :]
    sig_i, sig_j = g(state.sigma)[:, None], state.sigma[None, :]
    c6_i, c6_j = g(state.c6)[:, None], state.c6[None, :]
    c8_i, c8_j = g(state.c8)[:, None], state.c8[None, :]
    c10_i, c10_j = g(state.c10)[:, None], state.c10[None, :]

    # exclusions (src/System.cpp:1042-1064)
    lj_null = (eps_i == 0.0) | (sig_i == 0.0) | (eps_j == 0.0) | (sig_j == 0.0)
    cn_null = ((c6_i == 0.0) & (c8_i == 0.0) & (c10_i == 0.0) &
               (c6_j == 0.0) & (c8_j == 0.0) & (c10_j == 0.0))
    rd_excluded = jnp.where(same_mol & (not flags.gwp), True,
                            lj_null & cn_null)
    q_i, q_j = g(state.charge)[:, None], state.charge[None, :]
    es_excluded = jnp.where(same_mol & (not flags.gwp), True,
                            (q_i == 0.0) | (q_j == 0.0))

    sigma, epsilon, attractive_only, sigrep, c6m, c8m, c10m = mix_lj(
        flags, eps_i, eps_j, sig_i, sig_j,
        g(state.omega)[:, None], state.omega[None, :],
        g(state.polarizability)[:, None], state.polarizability[None, :],
        c6_i, c6_j, c8_i, c8_j, c10_i, c10_j)

    # SPECTRE overrides (src/System.cpp:1181-1194)
    if flags.spectre:
        sp_i, sp_j = g(state.spectre)[:, None], state.spectre[None, :]
        both = sp_i & sp_j
        one = sp_i ^ sp_j
        rd_excluded = jnp.where(both, False, jnp.where(one, True, rd_excluded))
        es_excluded = jnp.where(both, True, jnp.where(one, False, es_excluded))

    if rows is None:
        idx = jnp.arange(A)
        pair_once = (idx[:, None] < idx[None, :]) & alive
    elif block_global:
        # tile of the dense triangle: global col > row rule, so summing
        # over a block partition of all atoms counts each pair once
        safe = jnp.clip(rows, 0, A - 1)
        col = jnp.arange(A)[None, :]
        pair_once = row_valid[:, None] & alive & (col > safe[:, None])
    else:
        # count each pair touching the row molecule exactly once: rows vs
        # other molecules always; intra-molecular only for col > row
        safe = jnp.clip(rows, 0, A - 1)
        col = jnp.arange(A)[None, :]
        pair_once = (row_valid[:, None] & alive &
                     (~same_mol | (col > safe[:, None])))

    return PairTensors(
        dimg=dimg, rimg=rimg, r=r,
        pair_once=pair_once, alive=alive, same_mol=same_mol, frozen=frozen,
        rd_excluded=rd_excluded, es_excluded=es_excluded,
        sigma=sigma, epsilon=epsilon, attractive_only=attractive_only,
        sigrep=sigrep, c6=c6m, c8=c8m, c10=c10m,
        rows=rows, row_start=row_start)


def build_pairs(state: SystemState, flags: FFlags) -> PairTensors:
    """Dense [A,A] pair tensors for the full-energy path."""
    return _build(state, flags, None)


def build_pairs_rect(state: SystemState, flags: FFlags,
                     rows) -> PairTensors:
    """[S,A] pair tensors for the atoms in ``rows`` (padded with -1) against
    all atoms — the Delta-E slice."""
    return _build(state, flags, rows)


def build_pairs_block(state: SystemState, flags: FFlags,
                      rows) -> PairTensors:
    """[B,A] tile of the dense upper triangle: summing any block partition
    of the atom axis visits every pair exactly once — the O(B*A)-memory
    tiling used for large-system full energies."""
    return _build(state, flags, rows, block_global=True)
