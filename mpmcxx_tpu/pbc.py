"""Triclinic periodic boundary conditions.

The box is a 3x3 basis matrix (rows = lattice vectors).  Volume is det(basis),
the "reciprocal" basis is inverse(basis) laid out so that fractional
coordinates are ``frac = cart @ reciprocal`` (reference layout:
src/PeriodicBoundary.cpp:83-101), and the interaction cutoff is half the
shortest lattice vector found by brute coefficient search
(src/PeriodicBoundary.cpp:40-66).

Here the cutoff search is vectorised (a one-shot einsum over the +-15^3
coefficient lattice) rather than the reference's triple loop, and minimum
image is a pure batched function suitable for jit/vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as const

MAX_VECT_COEF = 15


def basis_volume(basis):
    """det of the 3x3 basis via the scalar triple product
    (src/PeriodicBoundary.cpp:71-78); avoids LU kernels absent on TPU
    for float64."""
    return jnp.dot(basis[0], jnp.cross(basis[1], basis[2]))


def reciprocal_basis(basis):
    """Inverse-basis: the reference's cofactor matrix
    (src/PeriodicBoundary.cpp:83-101) equals inv(basis) for a row-vector
    basis.  Minimum image projects fractional coords as ``d @ recip``
    (src/System.cpp:1228-1235) and reciprocal lattice vectors are
    ``k = 2*pi * l @ recip.T`` (src/System.Energy.cpp:1586-1590).

    Computed via the analytic 3x3 cofactor expansion: exact, cheap, and —
    unlike jnp.linalg.inv — supported in float64 on TPU (no LU
    decomposition kernel needed).
    """
    b = basis
    cof = jnp.stack([
        jnp.cross(b[1], b[2]),
        jnp.cross(b[2], b[0]),
        jnp.cross(b[0], b[1]),
    ], axis=1)  # columns are cofactor vectors -> inv = cof / det
    det = jnp.dot(b[0], jnp.cross(b[1], b[2]))
    return cof / det


def shortest_half_vector(basis) -> jnp.ndarray:
    """Cutoff = half the shortest nonzero lattice vector (brute search)."""
    rng = np.arange(-MAX_VECT_COEF, MAX_VECT_COEF + 1)
    coefs = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1).reshape(-1, 3)
    coefs = coefs[np.any(coefs != 0, axis=1)]
    coefs = jnp.asarray(coefs, dtype=jnp.float64 if basis.dtype == jnp.float64 else jnp.float32)
    vecs = coefs @ basis  # [M,3]
    mags = jnp.linalg.norm(vecs, axis=-1)
    return 0.5 * jnp.min(mags)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PBC:
    """Periodic boundary state: basis, reciprocal, volume, cutoff."""

    basis: jnp.ndarray       # [3,3] rows are lattice vectors a,b,c
    reciprocal: jnp.ndarray  # [3,3] such that frac = cart @ reciprocal
    volume: jnp.ndarray      # scalar
    cutoff: jnp.ndarray      # scalar

    def tree_flatten(self):
        return (self.basis, self.reciprocal, self.volume, self.cutoff), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_basis(cls, basis) -> "PBC":
        basis = jnp.asarray(basis)
        return cls(
            basis=basis,
            reciprocal=reciprocal_basis(basis),
            volume=basis_volume(basis),
            cutoff=shortest_half_vector(basis),
        )

    def scale(self, factor) -> "PBC":
        """Isotropically scale the box (NPT volume move).

        The cutoff scales linearly with the basis, so no re-search is needed
        inside jit.
        """
        return PBC(
            basis=self.basis * factor,
            reciprocal=self.reciprocal / factor,
            volume=self.volume * factor ** 3,
            cutoff=self.cutoff * factor,
        )


def _mul3(d, M):
    """``einsum('...p,pq->...q', d, M)`` with the size-3 contraction
    unrolled: a dot_general contracting a length-3 axis lowers to a
    serial while loop on TPU (~60 us of loop overhead per op instance in
    the MC hot path); three broadcast multiply-adds fuse instead."""
    return (d[..., 0:1] * M[0] + d[..., 1:2] * M[1] + d[..., 2:3] * M[2])


def minimum_image_disp(d, basis, reciprocal):
    """Minimum-image a displacement (batch) ``d[...,3]``.

    Returns (dimg, rimg): the minimum-image displacement and its norm.
    Matches src/System.cpp:1202-1279: project into fractional coords, rint,
    project back, subtract.
    """
    frac = _mul3(d, reciprocal)
    img = jnp.round(frac)
    shift = _mul3(img, basis)
    di = d - shift
    ri = jnp.linalg.norm(di, axis=-1)
    return di, ri


def wrap_positions(pos, basis, reciprocal):
    """Wrap positions into the central cell (centered at origin).

    Equivalent to minimum-imaging each position against the origin.
    """
    di, _ = minimum_image_disp(pos, basis, reciprocal)
    return di


def cart_to_frac(cart, reciprocal):
    return _mul3(cart, reciprocal)


def frac_to_cart(frac, basis):
    return _mul3(frac, basis)
