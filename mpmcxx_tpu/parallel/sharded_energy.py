"""Mesh-sharded full energy: the O(A^2) pair work split over devices.

The reference scales by *replicating* whole systems across MPI ranks
(replica-DP / PI beads); single-system size is capped by one node.  On
TPU the atom axis itself shards: each device owns a contiguous slice of
pair-tensor ROWS (the [B,A] tiles of ops.energy.energy_breakdown_blocked),
computes its partial sums, and the scalars reduce with ``psum`` over ICI.

Polarization shards the same way and is the point: the five float32
coefficient planes of the mixed SCF are [A_local, A] per device, so the
per-chip HBM cap on the incremental polarizable path (~16k atoms, see
ops.polar_cache.supports) becomes ~16k * n_devices.  Each SCF iteration
is a local row contraction + one ``all_gather`` of the [A,3] field —
a few KB over ICI per iteration.

No reference anchor: MPMC++ has no spatial decomposition at all; this is
the TPU-native replacement for "buy a bigger node".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import constants as const
from ..flags import FFlags, RunParams
from ..ops import ewald, pair_potentials
from ..ops import polar as polar_mod
from ..ops.energy import EnergyBreakdown
from ..ops.pairwise import build_pairs_block, build_pairs_rect
from ..state import SystemState

try:
    from jax import shard_map as _shard_map  # jax >= 0.8: top-level
    _CHECK_KW = "check_vma"
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _CHECK_KW = "check_rep"


def shard_map(*a, **kw):
    # the replication-checker kwarg was renamed check_rep -> check_vma
    # across the experimental -> top-level move
    if "check_rep" in kw:
        kw[_CHECK_KW] = kw.pop("check_rep")
    return _shard_map(*a, **kw)


def _row_slices(A: int, n_dev: int, block: int):
    """Global row ids padded so every device gets equal contiguous work."""
    per_dev = -(-A // n_dev)
    per_dev = -(-per_dev // block) * block
    ids = jnp.arange(n_dev * per_dev)
    return jnp.where(ids < A, ids, -1).reshape(n_dev, per_dev)


def sharded_breakdown(state: SystemState, flags: FFlags, params: RunParams,
                      mesh: Mesh, axis: str = "replica",
                      block: int = 256) -> EnergyBreakdown:
    """energy_breakdown_blocked with the row loop sharded over ``axis``.

    Call under ``jax.jit`` with ``state`` replicated; returns replicated
    scalars.  Supports the same flag set as the blocked path.
    """
    if flags.rd_crystal or flags.gwp or flags.spectre or flags.rd_anharmonic:
        # these change the pair-term semantics themselves (lattice-image
        # sums / wavepacket coulomb / charge sampling / bond springs) and
        # have no row-sliced kernels; single-chip only (README "Multi-chip
        # coverage")
        raise ValueError(
            "sharded energy: rd_crystal / gwp / spectre / rd_anharmonic "
            "run single-chip only (dense energy_breakdown)")
    if flags.polarization and not flags.polar_mixed:
        raise ValueError("sharded polarization runs on the mixed-precision "
                         "planes; set polar_mixed")
    if (flags.polarvdw or flags.using_axilrod_teller) and \
            state.n_atom_slots > 4096:
        # these terms build dense replicated tensors on every device
        # (polarvdw: the [A,A,3,3] f64 Thole A-matrix = 81*A^2 bytes,
        # ~5.4 GB at A=8192 — the same class of buffer whose OOM once
        # took the TPU worker down for half an hour, see CLAUDE.md)
        raise ValueError(
            "sharded polarvdw/Axilrod-Teller replicate dense [A,A(,3,3)] "
            "tensors per device; capped at 4096 atom slots "
            f"(got {state.n_atom_slots})")
    A = state.n_atom_slots
    n_dev = mesh.shape[axis]
    rows_all = _row_slices(A, n_dev, block)
    per_dev = rows_all.shape[1]
    nblocks = per_dev // block
    use_es = not (flags.use_sg or flags.rd_only)

    def rd_pair(pt):
        if flags.use_dreiding:
            return pair_potentials.dreiding(state, pt, flags, params)
        if flags.using_lj_buffered_14_7:
            return pair_potentials.lj_buffered_14_7(state, pt, flags, params)
        if flags.using_disp_expansion:
            return pair_potentials.disp_expansion(state, pt, flags, params,
                                                  pair_only=True)
        if flags.cdvdw_exp_repulsion:
            return pair_potentials.exp_repulsion(state, pt, flags, params,
                                                 pair_only=True)
        if flags.use_sg:
            return pair_potentials.sg(state, pt, flags, params)
        return pair_potentials.lj(state, pt, flags, params, pair_only=True)

    # check_vma=False: the polar outputs ARE replicated (every device sees
    # the same all_gather'd field each SCF iteration), but the static
    # varying-axis checker can't prove that through the while_loop
    _smap = partial(shard_map, mesh=mesh, in_specs=(P(axis), P()),
                    out_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
                    check_rep=False)

    @_smap
    def local(rows_slice, st):
        rows_slice = rows_slice[0]          # [per_dev]

        def body(carry, b):
            rd_acc, es_acc, pen_acc = carry
            rows = jax.lax.dynamic_slice(rows_slice, (b * block,), (block,))
            pt = build_pairs_block(st, flags, rows)
            rd_acc = rd_acc + rd_pair(pt)
            if use_es:
                if flags.wolf:
                    es_acc = es_acc + ewald.coulombic_wolf(st, pt, flags,
                                                           params)
                else:
                    es_acc = es_acc + ewald.coulombic_real(st, pt, flags,
                                                           params)
            if flags.cavity_autoreject_absolute:
                pen_acc = pen_acc | jnp.any(
                    pt.pair_once & ~pt.same_mol &
                    (pt.rimg < params.cavity_autoreject_scale))
            return (rd_acc, es_acc, pen_acc), None

        # initial carry must be marked as varying over the mesh axis
        # (the row slice differs per device)
        def vary(x):
            try:
                return jax.lax.pcast(x, (axis,), to="varying")
            except AttributeError:  # older jax spells it pvary
                return jax.lax.pvary(x, (axis,))

        (rd, es, pen), _ = jax.lax.scan(
            body, (vary(jnp.zeros(())), vary(jnp.zeros(())),
                   vary(jnp.zeros((), bool))),
            jnp.arange(nblocks))
        rd = jax.lax.psum(rd, axis)
        es = jax.lax.psum(es, axis)
        pen = jax.lax.psum(pen.astype(jnp.int32), axis) > 0

        if flags.polarization and use_es:
            # row-sharded mixed-precision SCF: local planes; rows place at
            # their true window start and psum across devices (a tiled
            # all_gather would misalign when the tail device's padded
            # window is shifted into bounds by the row normalisation)
            from ..ops.pairwise import normalize_window, update_rows
            pt = build_pairs_rect(st, flags, rows_slice)
            w_start, _, w_valid = normalize_window(rows_slice, A)
            co, cd = polar_mod.mixed_coeff_scalars(st, pt, flags, params)
            d32 = pt.dimg.astype(jnp.float32)
            planes = polar_mod.fold_outer_rows(co, cd, d32[..., 0],
                                               d32[..., 1], d32[..., 2],
                                               flags)
            f = polar_mod.field_scalars(st, pt, flags, params)
            e_rows = jnp.einsum("sj,j,sjp->sp", f, st.charge, pt.dimg)

            def place(rows_val):
                z = jnp.zeros((A,) + rows_val.shape[1:], rows_val.dtype)
                masked = jnp.where(
                    w_valid.reshape((-1,) + (1,) * (rows_val.ndim - 1)),
                    rows_val, 0)
                return jax.lax.psum(update_rows(z, w_start, masked), axis)

            E = place(e_rows)
            if flags.polar_ewald:
                E = E + polar_mod.recip_term(st, flags, params)
            E = jnp.where(st.atom_alive()[:, None], E, 0.0)

            def contract_fn(m):
                return place(polar_mod.contract_mixed(
                    planes, m, l=params.polar_damp))

            res = polar_mod.finish_polar(st, flags, params, E, contract_fn)
            pol, mu, iters, failed, rrms = res
        else:
            pol = jnp.zeros(())
            mu = st.mu * 0.0
            iters = jnp.zeros(())
            failed = jnp.zeros((), bool)
            rrms = jnp.zeros(())
        return rd, es, pen, pol, mu, iters, failed, rrms

    rd, es, pen_hit, pol, mu, pol_iters, failed, rrms = local(rows_all,
                                                              state)

    # whole-system once-only terms (O(A) / O(A*K): replicated)
    if flags.rd_lrc and not (flags.use_sg or flags.use_dreiding or
                             flags.using_lj_buffered_14_7):
        empty = build_pairs_block(state, flags,
                                  -jnp.ones(1, dtype=jnp.int32))
        if flags.using_disp_expansion:
            rd = rd + pair_potentials.disp_expansion(state, empty, flags,
                                                     params)
        elif flags.cdvdw_exp_repulsion:
            rd = rd + pair_potentials.exp_repulsion(state, empty, flags,
                                                    params)
        else:
            rd = rd + pair_potentials.lj(state, empty, flags, params)

    coul = jnp.zeros(())
    if use_es:
        coul = es
        if not flags.wolf:
            coul = coul + ewald.coulombic_reciprocal(state, flags, params) \
                + ewald.coulombic_self(state, params)

    # whole-system many-body terms, computed replicated on every device:
    # polarvdw is an eigendecomposition of the 3N x 3N Thole matrix and
    # Axilrod-Teller an O(N^3) triple sum — neither row-shards, both only
    # appear in small-N workloads where the sharded O(A^2) pair work above
    # still pays.  Scaling story: pair + SCF terms shard; these replicate.
    z = jnp.zeros(())
    vdw_e = z
    tb = z
    if flags.polarvdw or flags.using_axilrod_teller:
        from ..ops import polarvdw, three_body
        from ..ops.pairwise import build_pairs
        pt_dense = build_pairs(state, flags)
        if flags.polarvdw:
            amat = polar_mod.thole_amatrix(state, pt_dense, flags, params)
            vdw_e = polarvdw.vdw(state, amat, pt_dense, flags, params)
        if flags.using_axilrod_teller:
            tb = three_body.axilrod_teller(state, pt_dense, flags)

    total = rd + coul + pol + vdw_e + tb
    pen = jnp.where(pen_hit, const.MAXVALUE, 0.0) \
        if flags.cavity_autoreject_absolute else z
    return EnergyBreakdown(
        total=total, rd=rd, coulombic=coul, polarization=pol, vdw=vdw_e,
        three_body=tb, kinetic=z, mu=mu,
        polarization_iterations=pol_iters, iterator_failed=failed,
        dipole_rrms=rrms, cavity_penalty=pen)
