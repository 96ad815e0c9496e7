"""Pallas TPU kernel: cavity-grid occupancy.

The cavity-bias grid test (src/System.Cavity.cpp:15-89) is a pure geometric
predicate — G^3 grid points x A atoms distance checks — rebuilt before every
move when cavity_bias is on.  That is the one hot op in this framework where
float32 is physically safe (occupancy thresholds are O(1 Angstrom); f32
relative error ~1e-7 is far below any meaningful cavity radius), so it gets
a fused Pallas kernel: tiles of grid points stream against the atom list in
VMEM with no [G^3, A] distance matrix ever materialised in HBM.

TPU float64 is not supported by Mosaic on this chip (see ops/linalg.py for
the other consequences), which is why the energy kernels stay in XLA-f64 and
Pallas is reserved for predicates like this one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 256


def _occupancy_kernel(pts_ref, pos_ref, r2_ref, occ_ref):
    """One tile of grid points vs all atoms.

    Coordinates are lane-padded to 128 (xyz in lanes 0..2, zeros beyond),
    so the cross term is a single MXU matmul and every shape is
    (8,128)-tileable.  Dead/padded atoms are pre-moved to a far sentinel
    position on the host, so the kernel is a pure distance predicate:
    pts: [TILE,128]; pos: [A,128]; r2: [1,1] SMEM; occ out: [TILE,128].
    """
    pts = pts_ref[:]                       # [T,128]
    posT = pos_ref[:]                      # [128,A] (host-transposed)
    r2 = r2_ref[0, 0]
    # exact f32 per-axis differences on the VPU.  (The MXU |p|^2+|a|^2-2p.a
    # route silently downcasts the matmul inputs to bf16 on this chip,
    # which is 0.5-Angstrom-level error at these magnitudes.)
    dx = pts[:, 0:1] - posT[0:1, :]
    dy = pts[:, 1:2] - posT[1:2, :]
    dz = pts[:, 2:3] - posT[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz                         # [T,A]
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    hit = jnp.where(d2 < r2, one, zero)
    occ = jnp.max(hit, axis=1, keepdims=True)                # [T,1]
    occ_ref[:] = jnp.broadcast_to(occ, occ_ref.shape).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def occupancy_pallas(points, positions, alive, radius, interpret=False):
    """[P] bool occupancy of grid points within ``radius`` of a live atom."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = points.shape[0]
    A = positions.shape[0]
    padP = (-P) % TILE
    padA = (-A) % 128
    Ap = A + padA
    FAR = jnp.float32(1.0e6)
    pts = jnp.zeros((P + padP, 128), jnp.float32)
    pts = pts.at[:P, :3].set(points.astype(jnp.float32))
    # padded grid rows sit at the origin; that is fine (their occupancy is
    # sliced away).  Dead/padded atoms go to the far sentinel.
    pos = jnp.full((Ap, 128), 0.0, jnp.float32)
    pos = pos.at[:, 0].set(FAR)
    masked = jnp.where(alive[:, None], positions.astype(jnp.float32), FAR)
    pos = pos.at[:A, :3].set(masked)
    posT = pos.T  # [128, Ap]
    r2 = jnp.asarray([[radius * radius]], dtype=jnp.float32)

    grid = (pts.shape[0] // TILE,)
    occ = pl.pallas_call(
        _occupancy_kernel,
        out_shape=jax.ShapeDtypeStruct((pts.shape[0], 128), jnp.float32),
        grid=grid,
        # NOTE: index maps use i*0 rather than literal 0 — under
        # jax_enable_x64 a literal is i64 while the grid index is i32, and
        # Mosaic rejects the mixed-type index tuple.
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, Ap), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts, posT, r2)
    return occ[:P, 0] > 0.5


def occupancy(points, positions, alive, radius):
    """Occupancy with automatic backend choice: Pallas on TPU, plain XLA
    elsewhere (or when the kernel is unavailable)."""
    if jax.default_backend() in ("cpu",):
        d = points[:, None, :] - positions[None, :, :]
        r2 = jnp.sum(d * d, axis=-1)
        return jnp.any((r2 < radius * radius) & alive[None, :], axis=1)
    return occupancy_pallas(points, positions, alive, radius)
