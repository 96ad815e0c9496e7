"""Replica parallelism over the device mesh.

The reference's only data-parallelism is MPI replica chains: every rank runs
an independent Markov chain and rank 0 gathers packed stat structs every
corrtime (src/System.MonteCarlo.cpp:213-248, 1902-2028; src/System.MPI.cpp).
Here replicas are a leading ``[R]`` axis vmapped over the chain step and
sharded across a ``jax.sharding.Mesh`` axis — chains run independently on
their devices and the corrtime "gather" is one device-to-host transfer of a
small stats pytree (no message packing, no barriers).

Parallel tempering — designed but disabled in the reference
(src/System.MonteCarlo.cpp:1767-1897 commented out) — is implemented as a
temperature-ladder permutation over the replica axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as const
from ..flags import FFlags, RunParams
from ..mc import chain as chain_mod


def make_mesh(n_devices: Optional[int] = None, axis: str = "replica") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate_carry(carry: chain_mod.MCCarry, n_replicas: int,
                    base_seed: int = 0) -> chain_mod.MCCarry:
    """Broadcast a single-chain carry to [R] replicas with independent RNG
    streams (the reference gives each rank the same input but a different
    seed path)."""
    def bcast(x):
        return jnp.broadcast_to(x, (n_replicas,) + jnp.shape(x))
    carry_r = jax.tree_util.tree_map(bcast, carry)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(base_seed), i))(jnp.arange(n_replicas))
    return carry_r._replace(key=keys)


def make_replica_runner(flags: FFlags, params: RunParams,
                        opts: chain_mod.MCOptions, chunk_steps: int,
                        mesh: Optional[Mesh] = None, axis: str = "replica"):
    """Jitted [R]-replica corrtime chunk, optionally sharded over a mesh."""
    step = chain_mod.make_step_fn(flags, params, opts)

    def chunk_one(carry):
        return jax.lax.scan(step, carry, None, length=chunk_steps)

    fn = jax.jit(jax.vmap(chunk_one))
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))

        def sharded(carry):
            carry = jax.device_put(
                carry, jax.tree_util.tree_map(lambda _: shard, carry))
            return fn(carry)
        return sharded
    return fn


# ---------------------------------------------------------------------------
# parallel tempering
# ---------------------------------------------------------------------------

def temperature_ladder(t_min: float, t_max: float, n: int) -> jnp.ndarray:
    """Geometric temperature ladder (the reference's design intent for
    bath temperatures)."""
    if n == 1:
        return jnp.asarray([t_min])
    ratio = (t_max / t_min) ** (1.0 / (n - 1))
    return t_min * ratio ** jnp.arange(n)


@partial(jax.jit, static_argnames=("parity",))
def tempering_swap(temperatures, energies, key, parity: int):
    """One alternating-parity neighbor-swap sweep over the ladder.

    Swap (i, i+1) accepted with exp((1/T_i - 1/T_j)(E_i - E_j)); swaps
    exchange the replica *temperatures* (chains keep their configurations),
    matching the reference's temper_system design
    (src/System.MonteCarlo.cpp:1790-1880).

    Returns (new_temperatures, swapped_mask).
    """
    R = temperatures.shape[0]
    idx = jnp.arange(R)
    is_left = (idx % 2 == parity) & (idx + 1 < R)
    right = jnp.clip(idx + 1, 0, R - 1)

    beta_i = 1.0 / temperatures
    beta_j = 1.0 / temperatures[right]
    factor = jnp.exp((beta_i - beta_j) * (energies - energies[right]))
    u = jax.random.uniform(key, (R,))
    do_swap = is_left & (u < factor)

    # build the permutation: i <-> i+1 where do_swap[i]
    perm = idx
    perm = jnp.where(do_swap, idx + 1, perm)
    swap_from_left = jnp.roll(do_swap, 1) & (idx > 0)
    perm = jnp.where(swap_from_left, idx - 1, perm)
    return temperatures[perm], do_swap
