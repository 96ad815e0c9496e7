"""Production multi-chip placement for the two drivers.

The reference's only per-step distributed sync is path-integral
bead-per-rank (MPI_Allgather of per-bead energies,
src/SimulationControl.PathIntegral.cpp:752-805); its standard-ensemble
MPI role is replica data parallelism (one chain per rank).  The
TPU-native equivalents both live on a ``jax.sharding.Mesh``:

* ``shard_pi_carry`` — the [P, ...] bead axis of a ``PICarry`` sharded
  over the mesh (bead-per-device, the Allgather replaced by the XLA
  collectives jit inserts for cross-bead sums/means), used by
  ``PISimulation(mesh=...)``.
* ``shard_chain_carry`` — the [A, A] SCF coefficient planes (and the
  other [A, k] polar-cache leaves) of an ``MCCarry`` row-sharded over
  the mesh, used by ``Simulation(mesh=...)``: the O(A^2) per-move SCF
  work splits across devices while control state replicates.  The
  sampled trajectory is bit-identical to single-device
  (tests/test_multichip_drivers.py asserts it end-to-end).

These are placement helpers, not program rewrites: the jitted step
functions are unchanged, and XLA's SPMD partitioner derives the
parallel program from the input shardings.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]


def shard_pi_carry(carry, mesh: Mesh, P_beads: int):
    """Place a PICarry's bead-axis leaves (stack, comps_per_bead, sf)
    on the mesh, one bead block per device; replicate control state."""
    n = mesh.devices.size
    if P_beads % n:
        raise ValueError(
            f"Trotter number {P_beads} not divisible by the "
            f"{n}-device mesh")
    ax = _axis(mesh)

    def beadwise(x):
        spec = P(ax, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    rep = NamedSharding(mesh, P())
    sharded = {"stack", "comps_per_bead", "sf"}
    rest = {f: jax.tree.map(lambda x: jax.device_put(x, rep),
                            getattr(carry, f))
            for f in carry._fields if f not in sharded}
    return carry._replace(
        stack=jax.tree.map(beadwise, carry.stack),
        comps_per_bead=beadwise(carry.comps_per_bead),
        sf=jax.tree.map(beadwise, carry.sf), **rest)


def shard_chain_carry(carry, mesh: Mesh):
    """Row-shard an MCCarry's polar-cache [A, *] leaves over the mesh;
    replicate everything else.  Requires the polar-incremental cache
    (``opts.polar_incremental``) — without planes there is no O(A^2)
    state worth splitting, and the caller should run replicated."""
    A = carry.state.n_atom_slots
    n = mesh.devices.size
    if A % n:
        raise ValueError(
            f"atom capacity {A} not divisible by the {n}-device mesh")
    ax = _axis(mesh)
    row = NamedSharding(mesh, P(ax, None))
    rep = NamedSharding(mesh, P())

    def _place(path, x):
        name = "/".join(str(p) for p in path)
        if "pcache" in name and getattr(x, "ndim", 0) == 2 and \
                x.shape[0] == A:
            return jax.device_put(x, row)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(_place, carry)


def plane_row_balance(state, n_shards: int) -> np.ndarray:
    """Per-device live-atom counts for the contiguous row sharding of
    the [A, A] planes: device d owns rows [d*A/n, (d+1)*A/n).  The
    per-device SCF work is proportional to its live rows (dead
    capacity rows are masked zeros), so max/mean of this vector is the
    work-imbalance factor reported by the multichip tests."""
    alive = np.asarray(state.atom_alive())
    blocks = alive.reshape(n_shards, -1)
    return blocks.sum(axis=1)


def bead_balance(P_beads: int, n_shards: int) -> np.ndarray:
    """Beads per device for the PI bead sharding (exact by
    construction when P % n == 0)."""
    base = np.full(n_shards, P_beads // n_shards)
    base[: P_beads % n_shards] += 1
    return base
