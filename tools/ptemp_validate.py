"""Parallel-tempering physics validation (VERDICT r4 item 5).

The tempering ladder is the one implemented-beyond-reference feature
(the reference's temper_system body is commented out,
src/System.MonteCarlo.cpp:1767-1897) that until now had only structural
tests (multiset preservation).  Two physics gates, run on CPU:

1. **Per-bath canonical means.**  With swaps exchanging temperatures
   (chains keep configurations), the energy samples collected at bath
   temperature T must reproduce an independent single-T chain's <E>(T)
   for every rung — tempering reshuffles walkers between canonical
   distributions but must not distort any of them.
2. **Swap acceptance law.**  Measured acceptance over all attempted
   neighbor swaps must match the analytic expectation
   <min(1, exp((b_i - b_j)(E_i - E_j)))> evaluated on the same sampled
   (E, T) pairs (the Metropolis exchange criterion).

Usage: python -m tools.ptemp_validate [--steps 40000]
Prints a table + verdict; results go into README Fidelity by hand.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

_T0 = time.time()


def _log(m):
    print(f"[ptemp {time.time() - _T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)


def block_err(x, n_blocks=10):
    x = np.asarray(x, float)
    nb = min(n_blocks, max(len(x) // 2, 1))
    bm = np.asarray([b.mean() for b in np.array_split(x, nb)])
    return float(x.mean()), float(bm.std(ddof=1) / np.sqrt(len(bm))
                                  if len(bm) > 1 else 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--swap-every", type=int, default=50)
    ap.add_argument("--baths", type=int, default=4)
    ap.add_argument("--tmin", type=float, default=100.0)
    ap.add_argument("--tmax", type=float, default=180.0)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mpmcxx_tpu import FFlags, RunParams, constants as const
    from mpmcxx_tpu.mc import chain as chain_mod
    from mpmcxx_tpu.parallel import replicas as rep
    from mpmcxx_tpu.state import AtomRecord, build_state

    # 16 LJ argon atoms in an 18 A box: dense enough that <E>(T) has a
    # clear slope across the ladder, small enough for CPU
    L = 18.0
    rng = np.random.default_rng(7)
    atoms = []
    i = 0
    for ix in range(4):
        for iy in range(2):
            for iz in range(2):
                i += 1
                p = (np.array([ix * 4.5, iy * 9.0, iz * 9.0]) - L / 2
                     + 2.25 + rng.uniform(-0.3, 0.3, 3))
                atoms.append(AtomRecord(
                    "Ar", "Ar", i, x=p[0], y=p[1], z=p[2], mass=39.948,
                    charge=0.0, epsilon=119.8, sigma=3.405))
    state, _ = build_state(atoms, np.eye(3) * L)
    flags = FFlags()
    params = RunParams(temperature=args.tmin)
    opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT,
                               move_factor=0.3)

    R = args.baths
    ladder = np.asarray(rep.temperature_ladder(args.tmin, args.tmax, R))
    _log(f"ladder: {np.round(ladder, 2)}")
    runner = rep.make_replica_runner(flags, params, opts, args.swap_every)

    def run_chains(tempering: bool, seed: int):
        """Run R chains; returns per-bath energy sample lists and, when
        tempering, the (analytic_p, accepted) swap records."""
        carry1 = chain_mod.init_carry(state, flags, params, opts, seed)
        carry = rep.replicate_carry(carry1, R, base_seed=seed)
        carry = carry._replace(temperature=jnp.asarray(ladder))
        key = jax.random.PRNGKey(seed + 7919)
        parity = 0
        bath_samples = {t: [] for t in range(R)}
        swaps = []
        n_chunks = args.steps // args.swap_every
        burn = n_chunks // 4
        for c in range(n_chunks):
            carry, _ = runner(carry)
            E = np.asarray(carry.obs.energy)
            T = np.asarray(carry.temperature)
            if c >= burn:
                for r in range(R):
                    b = int(np.argmin(np.abs(ladder - T[r])))
                    bath_samples[b].append(E[r])
            if tempering:
                key, k1 = jax.random.split(key)
                new_t, swapped = rep.tempering_swap(
                    carry.temperature, carry.obs.energy, k1, parity)
                if c >= burn:
                    # tempering_swap attempts pairs by REPLICA index
                    # (left partners i with i % 2 == parity, partner
                    # i+1); record each attempt's analytic Metropolis
                    # probability next to whether it was accepted
                    acc = np.asarray(swapped)
                    for i_ in range(parity, R - 1, 2):
                        p = min(1.0, float(np.exp(
                            (1 / T[i_] - 1 / T[i_ + 1])
                            * (E[i_] - E[i_ + 1]))))
                        swaps.append([p, float(acc[i_])])
                parity ^= 1
                carry = carry._replace(temperature=new_t)
        return bath_samples, swaps

    _log(f"tempering run: {R} baths x {args.steps} steps, swap every "
         f"{args.swap_every}")
    pt_samples, swaps = run_chains(True, args.seed)
    _log("independent single-T chains (no swaps)")
    ind_samples, _ = run_chains(False, args.seed + 1)

    ok = True
    print(f"{'T':>8s} {'PT <E>':>18s} {'indep <E>':>18s} {'sigma':>7s}")
    for b in range(R):
        m1, e1 = block_err(pt_samples[b])
        m2, e2 = block_err(ind_samples[b])
        err = max(np.hypot(e1, e2), 1e-9)
        ns = abs(m1 - m2) / err
        ok &= ns < 3.0
        print(f"{ladder[b]:>8.2f} {m1:>11.1f}+-{e1:<6.1f}"
              f"{m2:>11.1f}+-{e2:<6.1f}{ns:>7.2f}"
              f"{'  <-- DISAGREES' if ns >= 3.0 else ''}")

    sw = np.asarray(swaps)
    measured = sw[:, 1].mean()
    analytic = sw[:, 0].mean()
    # binomial-ish error on the measured rate + block error on analytic
    err = max(np.hypot(np.sqrt(measured * (1 - measured) / len(sw)),
                       block_err(sw[:, 0])[1]), 1e-9)
    ns = abs(measured - analytic) / err
    swap_ok = ns < 3.0
    ok &= swap_ok
    print(f"swap acceptance: measured {measured:.4f} vs analytic "
          f"<min(1,exp(dB dE))> {analytic:.4f} over {len(sw)} attempts "
          f"({ns:.2f} sigma){'' if swap_ok else '  <-- DISAGREES'}")
    print("VERDICT:", "AGREE (all within 3 sigma)" if ok else "DISAGREE")
    print(json.dumps({"ok": bool(ok), "swap_measured": float(measured),
                      "swap_analytic": float(analytic),
                      "n_attempts": int(len(sw))}))


if __name__ == "__main__":
    main()
