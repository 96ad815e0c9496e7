"""Pallas TPU kernel: fused mixed-precision SCF dipole contraction.

The hot op of polarizable MC (ops.polar.contract_mixed): per SCF iteration,
ef_i = -sum_j [ -s_ij (s_ij . mu_j) + cd_ij mu_j ] over FOUR [A,A] float32
planes (s = sqrt(-c_outer) d, ops.polar.fold_outer_rows; polar_wolf_full
keeps the unfolded 5-plane form co d (d.mu) + cd mu).  XLA evaluates this
as several elementwise+reduce passes (~31 ms at A=10240 on v5e); this
kernel streams every plane through VMEM exactly once — elementwise VPU
math + lane reduction, accumulated across column tiles — which is
HBM-bandwidth bound (~1.6 GB/pass at 4 planes).

All math is true float32 on the VPU: no matmuls, so the silent-bf16 MXU
trap (see ops/pallas_cavity.py) never applies.  Index maps use i*0 rather
than literal 0 for the usual x64 homogeneity reason.

Reference anchor: contract_dipoles (src/System.Energy.cpp:3564-3598) is
the same operation over the reference's [3N,3N] A-matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BR = 128        # row tile
BC_MAX = 2048   # column tile upper bound


def _pick_bc(A: int) -> int:
    bc = min(BC_MAX, A)
    while A % bc:
        bc //= 2
    return max(bc, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def contract_pallas(planes, mu, l=0.0, interpret=False):
    """-T mu over the 3-, 4- or 5-tuple of [A,A] f32 planes
    (ops.polar.fold_outer_rows); A must be a multiple of 128.  The
    3-plane mode recomputes the coefficients in-kernel from the masked
    displacements (ops.polar.coeffs_from_d) with the damping width ``l``
    riding row 3 of the mu block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .polar import coeffs_from_d

    mode = len(planes)
    A = planes[0].shape[0]
    bc = _pick_bc(A)
    grid = (A // BR, A // bc)

    m = mu.astype(jnp.float32).T             # [3,A] host-side transpose
    m8 = jnp.zeros((8, A), jnp.float32).at[:3].set(m)
    if mode == 3:
        m8 = m8.at[3].set(jnp.float32(l))

    def kernel(mu_ref, *refs):
        if mode == 5:
            co_ref, cd_ref, dx_ref, dy_ref, dz_ref, out_ref = refs
        elif mode == 4:
            cd_ref, dx_ref, dy_ref, dz_ref, out_ref = refs
        else:
            dx_ref, dy_ref, dz_ref, out_ref = refs
        j = pl.program_id(1)
        mx = mu_ref[0:1, :]
        my = mu_ref[1:2, :]
        mz = mu_ref[2:3, :]
        dxv = dx_ref[:]
        dyv = dy_ref[:]
        dzv = dz_ref[:]
        if mode == 3:
            cov, cdv = coeffs_from_d(dxv, dyv, dzv, mu_ref[3:4, :])
        else:
            cdv = cd_ref[:]
        dot = dxv * mx + dyv * my + dzv * mz
        if mode == 5:
            s = co_ref[:] * dot
        elif mode == 4:
            s = -dot
        else:
            s = cov * dot
        ex = jnp.sum(s * dxv + cdv * mx, axis=1, keepdims=True)
        ey = jnp.sum(s * dyv + cdv * my, axis=1, keepdims=True)
        ez = jnp.sum(s * dzv + cdv * mz, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
        val = jnp.where(lane == 0, jnp.broadcast_to(ex, out_ref.shape),
                        jnp.where(lane == 1,
                                  jnp.broadcast_to(ey, out_ref.shape),
                                  jnp.where(lane == 2,
                                            jnp.broadcast_to(
                                                ez, out_ref.shape),
                                            jnp.float32(0.0))))
        prev = jnp.where(j == 0, jnp.zeros_like(out_ref), out_ref[:])
        out_ref[:] = prev + val

    plane = pl.BlockSpec((BR, bc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, bc), lambda i, j: (i * 0, j),
                         memory_space=pltpu.VMEM),
        ] + [plane] * len(planes),
        out_specs=pl.BlockSpec((BR, 128), lambda i, j: (i, j * 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m8, *planes)
    return -out[:, :3].astype(jnp.float64)


def supported(A: int) -> bool:
    return A >= 256 and A % 128 == 0


# ---------------------------------------------------------------------------
# in-place adjacent-column window write (polar-cache commits)
# ---------------------------------------------------------------------------

def col_write_supported(A: int, S: int) -> bool:
    # S == 1 matters too: a lone [A,1] column dynamic_update_slice makes
    # XLA layout-assign part of the plane's use chain {0,1} against the
    # SCF kernel's {1,0}, materialising a full-plane layout copy per
    # committed plane per move (~1.4 ms at A=10752 -- the round-3
    # monatomic-flagship 2x regression, BENCH_r03 52.4 vs 106 moves/s)
    return A % 128 == 0 and A // 128 >= 2 and 1 <= S <= 128


@functools.partial(jax.jit, static_argnames=("interpret", "br"))
def write_columns_pallas(plane, cols, cstart, interpret=False, br=None):
    """plane[:, cstart + s] = cols[:, s] for s < S, in place.

    The polar-cache commit writes S adjacent columns of each [A,A] f32
    plane (the symmetric image of the moved molecule's row strip,
    ops.polar_cache.write_symmetric_rows).  As separate [A,1]
    dynamic_update_slice ops each write read-modify-writes the full
    128-lane tile band the column lives in (~2 x A x 128 x 4 B of HBM
    traffic **per column**, ~25 us each at A=11264); since the S columns
    of one molecule share that band, one streaming pass over it writes
    them all for the cost of one.  input_output_aliases keeps the rest
    of the plane untouched in HBM (the same in-place contract as the
    dynamic_update_slice chain it replaces).

    The band is two 128-lane tiles anchored at ``min(cstart // 128,
    A//128 - 2)`` so any S <= 128 window fits, wherever it straddles a
    tile boundary.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A = plane.shape[0]
    S = cols.shape[1]
    if br is None:
        # largest row block dividing A: fewer grid steps amortize per-tile
        # overhead (178 vs 194 us/call at A=11264 standalone); br=5632
        # overflows the 16 MB scoped-vmem stack, so cap well below
        for br in (2816, 2048, 1408, 1024, 512, 256, 128):
            if A % br == 0:
                break
    nlt = A // 128
    cstart = cstart.astype(jnp.int32)
    t = jnp.minimum(cstart // jnp.int32(128), jnp.int32(nlt - 2))
    scal = jnp.stack([t, cstart - t * jnp.int32(128)])

    def kernel(sref, cols_ref, plane_ref, out_ref):
        k = pl.program_id(1)
        c = sref[1] - k * 128
        lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
        out = plane_ref[:]
        for s in range(S):
            out = jnp.where(lane == c + s, cols_ref[:, s:s + 1], out)
        out_ref[:] = out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // br, 2),
        in_specs=[
            pl.BlockSpec((br, S), lambda i, k, sref: (i, k * 0)),
            pl.BlockSpec((br, 128), lambda i, k, sref: (i, sref[0] + k)),
        ],
        out_specs=pl.BlockSpec((br, 128),
                               lambda i, k, sref: (i, sref[0] + k)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, A), jnp.float32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(scal, cols, plane)


# ---------------------------------------------------------------------------
# symmetric contraction: read each unordered tile pair once
# ---------------------------------------------------------------------------

def _pick_b_sym(A: int):
    for b in (512, 256, 128):
        if A % b == 0 and A // b >= 2:
            return b
    return 0


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def contract_pallas_sym(planes, mu, l=0.0, interpret=False, block=None):
    """-T mu reading (close to) only the upper triangle of the 3-, 4- or
    5-tuple of planes (ops.polar.fold_outer_rows; the 3-plane mode
    recomputes coefficients in-kernel, see contract_pallas).

    T is symmetric: T_ij = co d (x) d + cd I with d antisymmetric entering
    quadratically, so the contraction can stream each unordered tile pair
    once and emit both ef_i (+= T_ij mu_j, lane reduction) and ef_j
    (+= T_ij^T mu_i, sublane reduction) — ~2x less HBM traffic than the
    full-plane pass, and this op is HBM-bound.

    Tile pairing uses the wrapped-column trick: square b x b tiles, row
    tile i is paired with column tile (i+c) % nr for c = 0..nr//2; when nr
    is even the c == nr/2 band is visited from both sides and weighted
    0.5.  The transpose contributions land in a per-(c) scratch output
    (no out-of-order output revisits) and are folded in afterwards with
    nc2 block rolls.

    Layout notes (this chip): mu is passed three ways to avoid in-kernel
    transposes (they miscompile — see CLAUDE.md): lanes-major [8,A] for
    the column block, and sublane-major [A,128] for the row block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .polar import coeffs_from_d

    mode = len(planes)
    A = planes[0].shape[0]
    b = block if block else _pick_b_sym(A)
    nr = A // b
    nc2 = nr // 2 + 1
    even = (nr % 2 == 0)
    grid = (nr, nc2)

    m = mu.astype(jnp.float32)
    m8 = jnp.zeros((8, A), jnp.float32).at[:3].set(m.T)     # lanes-major
    if mode == 3:
        m8 = m8.at[3].set(jnp.float32(l))
    mT = jnp.zeros((A, 128), jnp.float32).at[:, :3].set(m)  # sublane-major

    def kernel(mu_col_ref, mu_rowT_ref, *refs):
        if mode == 5:
            (co_ref, cd_ref, dx_ref, dy_ref, dz_ref,
             out_row_ref, out_col_ref) = refs
        elif mode == 4:
            cd_ref, dx_ref, dy_ref, dz_ref, out_row_ref, out_col_ref = refs
        else:
            dx_ref, dy_ref, dz_ref, out_row_ref, out_col_ref = refs
        c = pl.program_id(1)
        w = jnp.float32(1.0)
        if even:
            w = jnp.where(c == nr // 2, jnp.float32(0.5), jnp.float32(1.0))

        mxj = mu_col_ref[0:1, :]       # [1,b] mu of column atoms
        myj = mu_col_ref[1:2, :]
        mzj = mu_col_ref[2:3, :]
        dxv = dx_ref[:]
        dyv = dy_ref[:]
        dzv = dz_ref[:]
        if mode == 3:
            cov, cdv = coeffs_from_d(dxv, dyv, dzv, mu_col_ref[3:4, :])
        else:
            cdv = cd_ref[:]

        # ef_i += T_ij mu_j  (reduce over lanes)
        dot = dxv * mxj + dyv * myj + dzv * mzj
        if mode == 5:
            s = co_ref[:] * dot
        elif mode == 4:
            s = -dot
        else:
            s = cov * dot
        ex = jnp.sum(s * dxv + cdv * mxj, axis=1, keepdims=True) * w
        ey = jnp.sum(s * dyv + cdv * myj, axis=1, keepdims=True) * w
        ez = jnp.sum(s * dzv + cdv * mzj, axis=1, keepdims=True) * w
        lane = jax.lax.broadcasted_iota(jnp.int32, out_row_ref.shape, 1)
        val = jnp.where(lane == 0, jnp.broadcast_to(ex, out_row_ref.shape),
                        jnp.where(lane == 1,
                                  jnp.broadcast_to(ey, out_row_ref.shape),
                                  jnp.where(lane == 2,
                                            jnp.broadcast_to(
                                                ez, out_row_ref.shape),
                                            jnp.float32(0.0))))
        prev = jnp.where(c == 0, jnp.zeros_like(out_row_ref), out_row_ref[:])
        out_row_ref[:] = prev + val

        # ef_j += T_ij^T mu_i  (reduce over sublanes); skip the diagonal
        # band c == 0 — the full diagonal tile was already counted above
        mxi = mu_rowT_ref[:, 0:1]      # [b,1] mu of row atoms
        myi = mu_rowT_ref[:, 1:2]
        mzi = mu_rowT_ref[:, 2:3]
        wc = jnp.where(c == 0, jnp.float32(0.0), w)
        dot2 = dxv * mxi + dyv * myi + dzv * mzi
        if mode == 5:
            s2 = co_ref[:] * dot2
        elif mode == 4:
            s2 = -dot2
        else:
            s2 = cov * dot2
        gx = jnp.sum(s2 * dxv + cdv * mxi, axis=0, keepdims=True) * wc
        gy = jnp.sum(s2 * dyv + cdv * myi, axis=0, keepdims=True) * wc
        gz = jnp.sum(s2 * dzv + cdv * mzi, axis=0, keepdims=True) * wc
        sub = jax.lax.broadcasted_iota(jnp.int32, out_col_ref.shape, 1)
        cval = jnp.where(sub == 0, jnp.broadcast_to(gx, out_col_ref.shape),
                         jnp.where(sub == 1,
                                   jnp.broadcast_to(gy, out_col_ref.shape),
                                   jnp.where(sub == 2,
                                             jnp.broadcast_to(
                                                 gz, out_col_ref.shape),
                                             jnp.float32(0.0))))
        out_col_ref[:] = cval

    def wrap(i, c):
        # homogeneous i32 arithmetic: `%` promotes under x64 and recurses
        return jax.lax.rem((i + c).astype(jnp.int32), jnp.int32(nr))

    plane = pl.BlockSpec((b, b), lambda i, c: (i, wrap(i, c)),
                         memory_space=pltpu.VMEM)
    extra = {}
    if b >= 1024:
        # 5 double-buffered b x b f32 planes exceed Mosaic's default VMEM
        # budget at b=1024 (~42 MB); v5e has 128 MB
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out_row, out_col = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((A, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nc2, 8, A), jnp.float32)),
        grid=grid,
        **extra,
        in_specs=[
            pl.BlockSpec((8, b), lambda i, c: (i * 0, wrap(i, c)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda i, c: (i, c * 0),
                         memory_space=pltpu.VMEM),
        ] + [plane] * len(planes),
        out_specs=(pl.BlockSpec((b, 128), lambda i, c: (i, c * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, b), lambda i, c: (c, i * 0, i),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(m8, mT, *planes)

    # fold the transpose contributions: plane c's source block i targets
    # column block (i+c) % nr -> roll right by c*b and sum over c.
    # STATIC shifts: a vmap over traced shifts lowers each roll to a
    # serial while loop (~12 us/move for 4 SCF iterations, profiled r4);
    # a static python loop lowers to fused concat/slice instead.
    ef_col = out_col[0]
    for c in range(1, nc2):
        ef_col = ef_col + jnp.roll(out_col[c], c * b, axis=-1)
    total = out_row[:, :3] + ef_col[:3, :].T
    return -total.astype(jnp.float64)

# ---------------------------------------------------------------------------
# true-triangle contraction: exact tile triangle, resident accumulators
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def contract_pallas_tri(planes, mu, l=0.0, interpret=False, block=None):
    """-T mu over the exact unordered tile triangle (i <= j) of the 3-,
    4- or 5-tuple of [A,A] f32 planes — the successor schedule to
    contract_pallas_sym.

    Differences from the wrapped-column schedule, all HBM traffic:

    - **Exact triangle.**  A 1D grid of nr(nr+1)/2 steps walks row-major
      (i, i..nr-1) tile pairs from a scalar-prefetched [2,T] index table;
      the wrapped schedule's nr*(nr//2+1) steps re-visit the c == nr/2
      band from both sides at weight 0.5 (nr/2 extra tiles, ~4% of plane
      bytes at nr = 22).
    - **Resident transpose accumulator.**  The ef_j (+= T_ij^T mu_i)
      contributions accumulate into a single [8, A] lanes-major output
      block whose index map is constant, so Mosaic keeps it in VMEM for
      the whole grid and flushes it once — replacing the [nr//2+1, 8, A]
      per-band scratch output and the nc2-roll host epilogue.
    - **Resident mu.**  The lanes-major mu block [8, A] is likewise
      grid-invariant and sliced in-kernel at lane offset j*b, replacing
      a per-step [8, b] fetch.

    The per-tile VPU math is identical to contract_pallas_sym (see its
    docstring for the symmetry argument and the layout notes; reference
    anchor contract_dipoles, src/System.Energy.cpp:3564-3598).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np

    from .polar import coeffs_from_d

    mode = len(planes)
    A = planes[0].shape[0]
    b = block if block else _pick_b_sym(A)
    nr = A // b
    ij = np.array([(i, j) for i in range(nr) for j in range(i, nr)],
                  dtype=np.int32).T                    # [2, T]
    T = ij.shape[1]

    m = mu.astype(jnp.float32)
    m8 = jnp.zeros((8, A), jnp.float32).at[:3].set(m.T)     # lanes-major
    if mode == 3:
        m8 = m8.at[3].set(jnp.float32(l))
    mT = jnp.zeros((A, 128), jnp.float32).at[:, :3].set(m)  # sublane-major

    def kernel(sref, mu8_ref, mu_rowT_ref, *refs):
        if mode == 5:
            (co_ref, cd_ref, dx_ref, dy_ref, dz_ref,
             out_row_ref, out_col_ref) = refs
        elif mode == 4:
            cd_ref, dx_ref, dy_ref, dz_ref, out_row_ref, out_col_ref = refs
        else:
            dx_ref, dy_ref, dz_ref, out_row_ref, out_col_ref = refs
        t = pl.program_id(0)
        ii = sref[0, t]
        jj = sref[1, t]
        diag = ii == jj
        jb = jj * b

        @pl.when(t == 0)
        def _zero():
            out_col_ref[...] = jnp.zeros_like(out_col_ref)

        mxj = mu8_ref[0:1, pl.ds(jb, b)]   # [1,b] mu of column atoms
        myj = mu8_ref[1:2, pl.ds(jb, b)]
        mzj = mu8_ref[2:3, pl.ds(jb, b)]
        dxv = dx_ref[:]
        dyv = dy_ref[:]
        dzv = dz_ref[:]
        if mode == 3:
            cov, cdv = coeffs_from_d(dxv, dyv, dzv,
                                     mu8_ref[3:4, pl.ds(jb, b)])
        else:
            cdv = cd_ref[:]

        # ef_i += T_ij mu_j  (reduce over lanes)
        dot = dxv * mxj + dyv * myj + dzv * mzj
        if mode == 5:
            s = co_ref[:] * dot
        elif mode == 4:
            s = -dot
        else:
            s = cov * dot
        ex = jnp.sum(s * dxv + cdv * mxj, axis=1, keepdims=True)
        ey = jnp.sum(s * dyv + cdv * myj, axis=1, keepdims=True)
        ez = jnp.sum(s * dzv + cdv * mzj, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, out_row_ref.shape, 1)
        val = jnp.where(lane == 0, jnp.broadcast_to(ex, out_row_ref.shape),
                        jnp.where(lane == 1,
                                  jnp.broadcast_to(ey, out_row_ref.shape),
                                  jnp.where(lane == 2,
                                            jnp.broadcast_to(
                                                ez, out_row_ref.shape),
                                            jnp.float32(0.0))))
        prev = jnp.where(diag, jnp.zeros_like(out_row_ref), out_row_ref[:])
        out_row_ref[:] = prev + val

        # ef_j += T_ij^T mu_i  (reduce over sublanes); the diagonal tile
        # was fully counted by the row pass above (the [b,b] block holds
        # both orderings of its pairs), so skip it here
        mxi = mu_rowT_ref[:, 0:1]          # [b,1] mu of row atoms
        myi = mu_rowT_ref[:, 1:2]
        mzi = mu_rowT_ref[:, 2:3]
        wc = jnp.where(diag, jnp.float32(0.0), jnp.float32(1.0))
        dot2 = dxv * mxi + dyv * myi + dzv * mzi
        if mode == 5:
            s2 = co_ref[:] * dot2
        elif mode == 4:
            s2 = -dot2
        else:
            s2 = cov * dot2
        gx = jnp.sum(s2 * dxv + cdv * mxi, axis=0, keepdims=True) * wc
        gy = jnp.sum(s2 * dyv + cdv * myi, axis=0, keepdims=True) * wc
        gz = jnp.sum(s2 * dzv + cdv * mzi, axis=0, keepdims=True) * wc
        cur = out_col_ref[:, pl.ds(jb, b)]
        sub = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0)
        cval = jnp.where(sub == 0, jnp.broadcast_to(gx, cur.shape),
                         jnp.where(sub == 1,
                                   jnp.broadcast_to(gy, cur.shape),
                                   jnp.where(sub == 2,
                                             jnp.broadcast_to(gz, cur.shape),
                                             jnp.float32(0.0))))
        out_col_ref[:, pl.ds(jb, b)] = cur + cval

    plane = pl.BlockSpec((b, b), lambda t, s: (s[0, t], s[1, t]),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, A), lambda t, s: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda t, s: (s[0, t], t * 0),
                         memory_space=pltpu.VMEM),
        ] + [plane] * len(planes),
        out_specs=(pl.BlockSpec((b, 128), lambda t, s: (s[0, t], t * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, A), lambda t, s: (t * 0, t * 0),
                                memory_space=pltpu.VMEM)),
    )
    out_row, out_col = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((A, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, A), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(ij), m8, mT, *planes)

    total = out_row[:, :3] + out_col[:3, :].T
    return -total.astype(jnp.float64)
