"""On-chip A/B: contract_pallas_sym vs contract_pallas_tri.

The true-triangle kernel (ops/pallas_polar.contract_pallas_tri) is the
designed successor to the wrapped-column schedule: exact i <= j tile
triangle (the wrapped schedule revisits the c == nr/2 band at weight 0.5
— nr/2 extra tiles, ~4% of plane bytes at nr = 22), a resident [8,A]
transpose accumulator instead of the [nr//2+1, 8, A] per-band scratch +
host roll fold, and a resident lanes-major mu block.  Interpret-mode
numerics are gated in tests/test_pallas.py; this tool validates it on
the live chip at flagship scale and times both kernels chained inside
one jitted fori_loop.  Each timed segment still pays one host round-trip
(dispatch + scalar fetch, ~25 ms over the tunnel); at the default
reps=200 that amortizes to ~0.13 ms/contraction, an equal additive bias
on both kernels (~2% at the ~7 ms scale).

Usage (from the repo root; PYTHONPATH breaks axon plugin registration):
    python -m tools.ab_tri_kernel [--model co2|mono] [--reps 40]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

_T0 = time.time()


def _log(m):
    print(f"[ab_tri {time.time() - _T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="co2", choices=("co2", "mono"))
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--atoms", type=int, default=None,
                    help="synthetic mode: random 3-plane coefficients at "
                         "this capacity instead of the flagship state. "
                         "Fallback for remote-compile brownouts that cut "
                         "flagship-size Mosaic compiles at ~30 min (r5): "
                         "the contraction is HBM-bound from a few "
                         "thousand atoms up, so the sym-vs-tri verdict "
                         "transfers, with the caveat that the resident-"
                         "accumulator advantage grows with nr = A/b.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    import numpy as _np
    from mpmcxx_tpu.ops import pallas_polar, polar as polar_mod

    class _Syn:
        pass

    if args.atoms:
        A = int(args.atoms)
        _log(f"A = {A} (synthetic planes); building...")
        rng = _np.random.default_rng(11)
        d = rng.uniform(-1.0, 1.0, (3, A, A)).astype(_np.float32)
        d -= d.transpose(0, 2, 1)          # displacements: antisymmetric
        for p in d:
            _np.fill_diagonal(p, 0.0)
        coeffs = tuple(jnp.asarray(p) * 0.05 for p in d)
        state = _Syn()
        state.polarizability = jnp.full((A,), 1.1)
        E_static = jnp.asarray(rng.uniform(-1, 1, (A, 3)))

        class _P:
            polar_damp = 2.1304
        params = _P()
    else:
        import flagship
        if args.model == "co2":
            state, _m, flags, params, _o = flagship.build_state_co2()
        else:
            state, _m, flags, params, _o = flagship.build_state()
        A = state.n_atom_slots
        _log(f"A = {A}; building planes...")
        coeffs, E_static = jax.jit(
            lambda s: polar_mod.mixed_field_coeffs(s, flags, params))(state)
        jax.block_until_ready(coeffs)
    mu0 = (state.polarizability[:, None] * E_static)
    # per-kernel plane bytes: tri reads the exact tile triangle
    # nr(nr+1)/2; sym's wrapped-column schedule reads nr*(nr//2+1) tiles
    # (the c == nr/2 band twice at weight 0.5 -> ~4% more at nr = 22).
    b = pallas_polar._pick_b_sym(A)
    nr = A // b
    tile_gb = len(coeffs) * b * b * 4 / 1e9
    gbytes = {"tri": nr * (nr + 1) // 2 * tile_gb,
              "sym": nr * (nr // 2 + 1) * tile_gb}
    _log(f"{len(coeffs)} planes, b = {b}, nr = {nr}; bytes/pass "
         f"tri = {gbytes['tri']:.3f} GB, sym = {gbytes['sym']:.3f} GB "
         f"(HBM floor ~{gbytes['tri'] / 819 * 1e3:.2f} ms at 819 GB/s)")

    kernels = {
        "sym": lambda m: pallas_polar.contract_pallas_sym(
            coeffs, m, l=params.polar_damp),
        "tri": lambda m: pallas_polar.contract_pallas_tri(
            coeffs, m, l=params.polar_damp),
    }

    # --- numerics gate on the live chip (the tri kernel's only prior
    # validation is interpret mode) ---------------------------------------
    vals = {}
    for name, fn in kernels.items():
        try:
            v = np.asarray(jax.jit(fn)(mu0))
        except Exception as e:
            _log(f"{name}: numerics FAILED {type(e).__name__}: "
                 f"{str(e)[:300]}")
            vals[name] = None
            continue
        vals[name] = v
        _log(f"{name}: |ef| = {np.linalg.norm(v):.9e}")
    ok = True
    if vals.get("tri") is not None and vals.get("sym") is not None:
        scale = np.max(np.abs(vals["sym"])) or 1.0
        err = np.max(np.abs(vals["tri"] - vals["sym"])) / scale
        _log(f"tri vs sym max rel-to-scale err = {err:.3e}")
        ok = err < 5e-6       # both are f32 accumulations; ordering only
    else:
        ok = False

    # --- timing -----------------------------------------------------------
    results = {}
    for name, fn in kernels.items():
        if vals.get(name) is None:
            continue

        @jax.jit
        def chain(mu, fn=fn):
            def body(_, m):
                ef = fn(m)
                return state.polarizability[:, None] * (E_static + ef)
            return jax.lax.fori_loop(0, args.reps, body, mu)

        r = chain(mu0)
        float(jnp.sum(r))                            # force completion
        seg = []
        for _ in range(3):
            t0 = time.time()
            r = chain(mu0)
            float(jnp.sum(r))
            seg.append((time.time() - t0) / args.reps * 1e3)
        ms = float(np.median(seg))
        results[name] = ms
        _log(f"{name}: {ms:.3f} ms/contraction "
             f"(min {min(seg):.3f} max {max(seg):.3f}; "
             f"{gbytes[name] / (ms / 1e3):.0f} GB/s effective)")

    print(json.dumps({"A": A, "model": args.model, "numerics_ok": bool(ok),
                      "ms": results}))


if __name__ == "__main__":
    main()
