"""Tune the symmetric SCF contraction kernel's tile size on the live chip.

The contraction (ops/pallas_polar.contract_pallas_sym) is the flagship's
dominant per-move cost (4 iterations/move).  Tile size trades per-tile
overhead + out_row revisit traffic (fewer, larger tiles better) against
VMEM pressure; which b wins is a per-chip question.  This times K
CHAINED contractions inside one jitted fori_loop (single dispatch: the
timing is pure device time, immune to host contention and the ~25 ms
tunnel RTT) for every candidate block size dividing A.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/tune_scf_block.py
           [--model co2|mono] [--reps 40]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

_T0 = time.time()


def _log(m):
    print(f"[tune {time.time() - _T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="co2", choices=("co2", "mono"))
    ap.add_argument("--reps", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    import flagship
    from mpmcxx_tpu.ops import pallas_polar, polar as polar_mod

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
    gb = len(coeffs) * A * A * 4 / 2 / 1e9
    _log(f"{len(coeffs)} planes; triangle bytes/pass = {gb:.3f} GB "
         f"(HBM floor ~{gb / 0.819 * 1e3:.2f} ms at 819 GB/s)")

    # b >= 1024 excluded: Mosaic compile time is pathological there on
    # this backend (b=1408 ran >30 min then broke the tunnel pipe;
    # b=1024 was still compiling at 22 min when killed — r4).  Blocks
    # must be multiples of 128 that divide A, so for the flagship
    # A = 2^k x 11 capacities the practical ladder is just 512/256/128;
    # b=512 is the production default (_pick_b_sym).
    cands = [b for b in (512, 256, 128)
             if A % b == 0 and A // b >= 2]
    _log(f"candidate blocks: {cands}")
    results = {}
    for b in cands:
        try:
            @jax.jit
            def chain(mu):
                def body(_, m):
                    ef = pallas_polar.contract_pallas_sym(
                        coeffs, m, l=params.polar_damp, block=b)
                    return state.polarizability[:, None] * (E_static + ef)
                return jax.lax.fori_loop(0, args.reps, body, mu)

            r = chain(mu0)
            float(jnp.sum(r))                        # force completion
            seg = []
            for _ in range(3):
                t0 = time.time()
                r = chain(mu0)
                float(jnp.sum(r))
                seg.append((time.time() - t0) / args.reps * 1e3)
            ms = float(np.median(seg))
            results[b] = ms
            _log(f"b={b:5d}: {ms:.3f} ms/contraction "
                 f"(min {min(seg):.3f} max {max(seg):.3f}; "
                 f"{gb / (ms / 1e3):.0f} GB/s effective)")
        except Exception as e:
            _log(f"b={b}: FAILED {type(e).__name__}: {str(e)[:200]}")
    import json
    print(json.dumps({"A": A, "model": args.model, "ms": results}))


if __name__ == "__main__":
    main()
