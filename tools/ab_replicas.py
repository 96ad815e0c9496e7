"""On-chip replica-DP aggregate throughput: R vmapped flagship chains.

The reference spends hardware as R independent MPI chains with rank-0
corrtime aggregation (src/System.MonteCarlo.cpp:213-248, 1902-2028) —
its actual production operating mode.  Our equivalent on ONE chip is a
leading-[R] vmap of the chain step (parallel.replicas); this tool
measures what that buys: aggregate moves/s/chip vs the single-chain
bench number, for R = 1, 2, 4, ...

Expectation to test (docs/PERF.md): the per-move budget splits into an
HBM-bound SCF contraction (~4.6 ms at CO2 scale, ~81% of peak — R chains
multiply that traffic, no aggregate win there) and a ~1.5-2.8 ms tail of
small fusions + dispatch overhead that batching should amortize, so the
model predicts aggregate ~ R / (scf*R + tail) — a bounded (~1.2-1.5x)
gain, NOT the naive Rx.  HBM capacity is the hard cap: the 3 f32
[A,A] coefficient planes cost ~1.5 GB/chain at A = 11,264 against
16 GB, so R <= ~6 even before working buffers.  This tool stops at a
conservative plane budget (--max-gb, default 10) because an OOM takes
the remote worker down for ~20-40 min.

Usage (from the repo root; PYTHONPATH breaks axon plugin registration):
    python -m tools.ab_replicas [--model co2|mono|h2] [--rs 1,2,4]
                                [--steps 256] [--chunk 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

_T0 = time.time()


def _log(m):
    print(f"[ab_replicas {time.time() - _T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def build(model: str):
    from tools import flagship
    if model == "co2":
        return flagship.build_state_co2(), flagship.N_TOTAL_CO2
    if model == "h2":
        return flagship.build_state_h2(), flagship.N_TOTAL_H2
    return flagship.build_state(), flagship.N_TOTAL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="co2", choices=("co2", "mono", "h2"))
    ap.add_argument("--rs", default="1,2,4")
    ap.add_argument("--steps", type=int, default=256,
                    help="moves per timing segment, per chain")
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--segments", type=int, default=3)
    ap.add_argument("--max-gb", type=float, default=10.0,
                    help="skip R whose coefficient planes exceed this")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    from mpmcxx_tpu.mc import chain as chain_mod
    from mpmcxx_tpu.parallel import replicas as rep

    (state, _meta, flags, params, opts), n_total = build(args.model)
    _log(f"model={args.model}: {n_total} atoms, "
         f"{state.n_atom_slots} atom slots")
    carry1 = chain_mod.init_carry(state, flags, params, opts, seed=0)
    n_planes = 3  # polar_mixed 3-plane mode at flagship scale
    gb_chain = n_planes * state.n_atom_slots ** 2 * 4 / 1e9

    results = {}
    e_r1_chain0 = None
    for R in [int(x) for x in args.rs.split(",")]:
        gb = gb_chain * R
        if gb > args.max_gb:
            _log(f"R={R}: {gb:.1f} GB of planes > --max-gb "
                 f"{args.max_gb}; skipping (OOM risk)")
            results[str(R)] = {"skipped": f"{gb:.1f} GB planes"}
            continue
        carry = rep.replicate_carry(carry1, R, base_seed=0)
        runner = rep.make_replica_runner(flags, params, opts, args.chunk,
                                         mesh=None)
        _log(f"R={R}: compiling vmapped chunk ({gb:.1f} GB planes)...")
        try:
            carry, _ = runner(carry)
            e0 = [float(x) for x in np.asarray(carry.obs.energy)]
        except Exception as e:
            _log(f"R={R}: FAILED: {type(e).__name__}: {e}")
            results[str(R)] = {"error": f"{type(e).__name__}: {e}"}
            break
        _log(f"R={R}: compiled; E[0] = {e0[0]:.1f} K")
        if R == 1:
            e_r1_chain0 = e0[0]
        elif e_r1_chain0 is not None:
            # chain 0's RNG stream (fold_in(key, 0)) is the same at every
            # R: its first-chunk energy must track the R=1 run (f32 SCF
            # reassociation under vmap allows tiny drift; trajectory-level
            # bit-identity is asserted on CPU in tests/test_replicas.py)
            rel = abs(e0[0] - e_r1_chain0) / max(abs(e_r1_chain0), 1.0)
            _log(f"R={R}: chain-0 first-chunk E rel drift vs R=1: "
                 f"{rel:.2e}")
            results.setdefault(str(R), {})["chain0_rel_drift"] = rel

        rates = []
        for seg in range(args.segments):
            t0 = time.time()
            done = 0
            while done < args.steps:
                carry, _ = runner(carry)
                done += args.chunk
            float(np.asarray(carry.obs.energy)[0])
            dt = time.time() - t0
            rates.append(R * done / dt)
            _log(f"R={R} seg {seg}: {R}x{done} moves in {dt:.2f}s -> "
                 f"aggregate {R * done / dt:.1f} moves/s "
                 f"({done / dt:.1f}/chain)")
        med = float(np.median(rates))
        results.setdefault(str(R), {}).update({
            "aggregate_moves_per_sec": round(med, 2),
            "per_chain_moves_per_sec": round(med / R, 2),
            "min": round(min(rates), 2), "max": round(max(rates), 2),
            "planes_gb": round(gb, 2)})
        # free the batched carry before the next (bigger) replication
        del carry, runner

    print(json.dumps({"model": args.model, "atoms": n_total,
                      "chunk": args.chunk, "results": results}))


if __name__ == "__main__":
    main()
