"""TPU-friendly float64 dense linear algebra.

TPU XLA lacks float64 LU/QR/eig kernels (LuDecomposition supports only
F32/C64), so the polarization exact solve and the coupled-dipole
eigenspectrum get TPU-native implementations built from basic ops:

* ``solve_spd``: conjugate gradients on the (symmetric, positive-definite
  for physical polarizabilities) Thole matrix — the "matrix-free CG" design
  the rebuild targets anyway.
* ``jacobi_eigvalsh``: cyclic one-sided Jacobi rotations via lax.fori_loop,
  full float64 on any backend.

On CPU we keep jnp.linalg (LAPACK) for speed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _on_accelerator() -> bool:
    return jax.default_backend() not in ("cpu",)


def solve_spd(A, b, tol=1e-12, maxiter: int = None):
    """Solve A x = b for symmetric positive-definite A via CG."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = 4 * n

    def mv(x):
        return A @ x

    x0 = jnp.zeros_like(b)
    r0 = b - mv(x0)
    p0 = r0
    rs0 = jnp.dot(r0, r0)
    bnorm2 = jnp.maximum(jnp.dot(b, b), 1e-300)

    def cond(carry):
        x, r, p, rs, it = carry
        return (rs / bnorm2 > tol * tol) & (it < maxiter)

    def body(carry):
        x, r, p, rs, it = carry
        Ap = mv(p)
        alpha = rs / jnp.dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.dot(r, r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new, it + 1)

    x, *_ = jax.lax.while_loop(cond, body, (x0, r0, p0, rs0, 0))
    return x


def solve_sym(A, b):
    """Symmetric solve: LAPACK on CPU, CG on TPU."""
    if _on_accelerator():
        return solve_spd(A, b)
    return jnp.linalg.solve(A, b)


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigvalsh(A, sweeps: int = 12):
    """Eigenvalues of a symmetric matrix by cyclic Jacobi rotations.

    Convergence is quadratic; ``sweeps`` full cycles over all
    off-diagonal pairs suffices well past float64 roundoff for the
    moderately sized (3N x 3N) Thole matrices this serves.
    """
    n = A.shape[0]
    # precompute the cyclic (p,q) pair schedule
    ps, qs = jnp.triu_indices(n, k=1)
    npairs = ps.shape[0]

    def rotate(A, pq):
        p, q = pq
        apq = A[p, q]
        app = A[p, p]
        aqq = A[q, q]
        # compute rotation (t = tan theta) with the stable formula
        tau = (aqq - app) / (2.0 * jnp.where(apq == 0.0, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(apq == 0.0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # apply G^T A G where G rotates rows/cols p,q
        rowp = A[p, :]
        rowq = A[q, :]
        new_p = c * rowp - s * rowq
        new_q = s * rowp + c * rowq
        A = A.at[p, :].set(new_p).at[q, :].set(new_q)
        colp = A[:, p]
        colq = A[:, q]
        new_cp = c * colp - s * colq
        new_cq = s * colp + c * colq
        A = A.at[:, p].set(new_cp).at[:, q].set(new_cq)
        return A

    def sweep(_, A):
        def body(i, A):
            return rotate(A, (ps[i], qs[i]))
        return jax.lax.fori_loop(0, npairs, body, A)

    A = jax.lax.fori_loop(0, sweeps, sweep, A)
    return jnp.sort(jnp.diagonal(A))


def eigvalsh(A):
    """Symmetric eigenvalues: LAPACK on CPU, Jacobi on TPU."""
    if _on_accelerator():
        return jacobi_eigvalsh(A)
    return jnp.linalg.eigvalsh(A)
