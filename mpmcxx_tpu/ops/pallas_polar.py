"""Pallas TPU kernel: fused mixed-precision SCF dipole contraction.

The hot op of polarizable MC (ops.polar.contract_mixed): per SCF iteration,
ef_i = -sum_j [ co_ij d_ij (d_ij . mu_j) + cd_ij mu_j ] over five [A,A]
float32 planes.  XLA evaluates this as several elementwise+reduce passes
(~31 ms at A=10240 on v5e); this kernel streams every plane through VMEM
exactly once — elementwise VPU math + lane reduction, accumulated across
column tiles — which is HBM-bandwidth bound (~2 GB/pass).

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
def contract_pallas(co, cd, dx, dy, dz, mu, interpret=False):
    """-T mu over [A,A] f32 planes; A must be a multiple of 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A = co.shape[0]
    bc = _pick_bc(A)
    grid = (A // BR, A // bc)

    m = mu.astype(jnp.float32).T             # [3,A] host-side transpose
    m8 = jnp.zeros((8, A), jnp.float32).at[:3].set(m)

    def kernel(mu_ref, co_ref, cd_ref, dx_ref, dy_ref, dz_ref, out_ref):
        j = pl.program_id(1)
        mx = mu_ref[0:1, :]
        my = mu_ref[1:2, :]
        mz = mu_ref[2:3, :]
        dxv = dx_ref[:]
        dyv = dy_ref[:]
        dzv = dz_ref[:]
        cdv = cd_ref[:]
        s = co_ref[:] * (dxv * mx + dyv * my + dzv * mz)
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
            plane, plane, plane, plane, plane,
        ],
        out_specs=pl.BlockSpec((BR, 128), lambda i, j: (i, j * 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m8, co, cd, dx, dy, dz)
    return -out[:, :3].astype(jnp.float64)


def supported(A: int) -> bool:
    return A >= 256 and A % 128 == 0
