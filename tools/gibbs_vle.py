"""Gibbs-ensemble argon vapor-liquid coexistence vs published LJ data.

VERDICT r3 item 6: the volume-exchange move has no external oracle (the
reference's coupled volume acceptance inverts the volume ratio,
src/SimulationControl.Gibbs.cpp:466 — fixed here, README Fidelity), so
this tool validates it against physics instead: a full GEMC run
(displace + transfer + coupled volume exchange) of Lennard-Jones argon
at T* = kT/eps = 0.90 must reproduce the literature LJ coexistence
densities.

Literature anchor (full LJ with long-range corrections, the classic
GEMC/NpT+test-particle studies: Lotfi, Vrabec & Fischer, Mol. Phys. 76,
1319 (1992); Panagiotopoulos' GEMC data agrees within its error bars):

    T* = 0.90:   rho_l* = 0.7465 +- 0.002     rho_v* = 0.0146 +- 0.0015

Our run: 2 x 128 atoms (the N of the original GEMC studies), overall
rho* = 0.30, rd_lrc on, cutoff = L/2.  The denser box at each sample is
"liquid" (box identities can swap).  Agreement within ~2-3 combined
sigma (finite-size GEMC at N=256 carries a small systematic shift vs
the thermodynamic limit) validates the volume-exchange acceptance law
end-to-end.

Usage: python -m tools.gibbs_vle [--steps 600000] [--corrtime 400]
                                 [--warmup-frac 0.33] [--seed 4]
Prints a table + verdict; results go into README Fidelity by hand.

r4 results (defaults: lever start, move_factor 0.05, 600k steps),
with the corrected d(lnV)->dV Jacobian in the volume acceptance
(mc/gibbs.py bf_vol; tests/test_gibbs_replicas.py has the ideal-gas
uniform-V_a gate): seeds 4/5 give rho_l* = 0.7472+-0.0033 /
0.7485+-0.0030 (0.17 / 0.56 sigma) and rho_v* = 0.0098+-0.0009 /
0.0110+-0.0012 (1.9-2.7 sigma low — the 2x128 vapor box holds only
~7 atoms; --nbox 256 shrinks the small-N depletion) -> PASS.  See
README Fidelity for the two diagnostic dead ends (even split,
move_factor 0.4) preserved behind flags.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)

EPS, SIG, MASS = 119.8, 3.405, 39.948     # argon
TSTAR = 0.90
T_K = TSTAR * EPS                         # 107.82 K
N_BOX = 128                               # per box initially
RHO_TOTAL = 0.30                          # overall reduced density
LIT = {"rho_l": (0.7465, 0.002), "rho_v": (0.0146, 0.0015)}

_T0 = time.time()


def _log(m):
    print(f"[vle {time.time() - _T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def write_box(path, n, L, seed):
    """n argon atoms on a jittered lattice in an L^3 box (PQR, e units)."""
    rng = np.random.default_rng(seed)
    g = int(np.ceil(n ** (1 / 3)))
    s = L / g
    pts = []
    for i in range(g):
        for j in range(g):
            for k in range(g):
                if len(pts) < n:
                    pts.append(((i + .5) * s - L / 2, (j + .5) * s - L / 2,
                                (k + .5) * s - L / 2))
    pts = np.asarray(pts) + rng.uniform(-0.25, 0.25, (n, 3))
    with open(path, "w") as f:
        for m, (x, y, z) in enumerate(pts):
            f.write(f"ATOM  {m+1:5d} Ar   Ar M {m+1:4d}   "
                    f"{x:8.3f}{y:8.3f}{z:8.3f} {MASS:.5f}  0.00000 "
                    f"0.00000 {EPS:.5f} {SIG:.5f} 0.0 0.0\n")
        f.write("END\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600000)
    ap.add_argument("--corrtime", type=int, default=400)
    ap.add_argument("--warmup-frac", type=float, default=0.33)
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--nbox", type=int, default=N_BOX,
                    help="atoms per box at the even split (total 2*nbox); "
                    "larger totals shrink the small-N GEMC vapor depletion")
    ap.add_argument("--move-factor", type=float, default=0.05,
                    help="translation scale in units of the cutoff; the "
                    "r4 first attempts used 0.4 (~4.8 A max steps, near-zero "
                    "liquid acceptance -> unrelaxed liquid, too-high "
                    "pressure, under-dense boxes)")
    ap.add_argument("--init", choices=("even", "lever"), default="lever",
                    help="even: 128/128 split (the r4 first attempt — the "
                    "vapor box was still draining at 120k steps, only ~215 "
                    "transfer accepts); lever: split N by the lever rule at "
                    "the literature densities so transfers only handle "
                    "fluctuations, the standard GEMC start")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mpmcxx_tpu.config.parser import read_config
    from mpmcxx_tpu.mc.gibbs import GibbsSimulation

    n_box = args.nbox
    V_box = n_box / RHO_TOTAL * SIG ** 3     # A^3 per box
    L = V_box ** (1 / 3)
    _log(f"T = {T_K:.2f} K (T* = {TSTAR}), box L = {L:.2f} A, "
         f"{n_box} atoms/box, rho*_total = {RHO_TOTAL}")

    n_total, V_total = 2 * n_box, 2 * V_box
    if args.init == "lever":
        # lever rule at the literature densities: with total (N, V) fixed,
        # V_l*rho_l + (V_total - V_l)*rho_v = N  =>  equilibrium box loads
        rl, rv = LIT["rho_l"][0] / SIG ** 3, LIT["rho_v"][0] / SIG ** 3
        V_l = (n_total - V_total * rv) / (rl - rv)
        n_a = int(round(rl * V_l))
        n_b = n_total - n_a
    else:
        n_a = n_b = n_box
    _log(f"init '{args.init}': N = ({n_a}, {n_b}) in equal boxes "
         f"(volume moves re-partition V much faster than transfers move N)")

    td = tempfile.mkdtemp(prefix="gibbs_vle_")
    os.chdir(td)
    write_box("boxA.pqr", n_a, L, args.seed)
    write_box("boxB.pqr", n_b, L, args.seed + 1)
    with open("run.in", "w") as f:
        f.write(f"""job_name vle
ensemble nvt_gibbs
rd_lrc on
temperature {T_K}
transfer_probability 0.25
volume_probability 0.02
volume_change_factor 0.10
numsteps {args.steps}
corrtime {args.corrtime}
seed {args.seed}
move_factor {args.move_factor}
pqr_input boxA.pqr
pqr_input_B boxB.pqr
energy_output off
pqr_restart off
pqr_output off
traj_output off
basis1 {L:.6f} 0 0
basis2 0 {L:.6f} 0
basis3 0 0 {L:.6f}
""")
    sim = GibbsSimulation(read_config("run.in"), quiet=True)
    carry = sim._init_carry()
    _log("compiling Gibbs chunk...")

    n_chunks = args.steps // args.corrtime
    samples = []                 # (N_a, V_a, N_b, V_b) per corrtime
    for c in range(n_chunks):
        carry, _ = sim._run_chunk(carry)
        carry = sim._refresh(carry)
        na = float(np.asarray(carry.state_a.mol_alive).sum())
        nb = float(np.asarray(carry.state_b.mol_alive).sum())
        va = float(carry.state_a.pbc.volume)
        vb = float(carry.state_b.pbc.volume)
        samples.append((na, va, nb, vb))
        if c % 25 == 0 or c == n_chunks - 1:
            ra = na / va * SIG ** 3
            rb = nb / vb * SIG ** 3
            _log(f"chunk {c + 1}/{n_chunks}: rho* = ({ra:.4f}, {rb:.4f}) "
                 f"N = ({na:.0f}, {nb:.0f}) "
                 f"V* = ({va / SIG**3:.1f}, {vb / SIG**3:.1f})")

    burn = int(len(samples) * args.warmup_frac)
    use = np.asarray(samples[burn:])
    rho_a = use[:, 0] / use[:, 1] * SIG ** 3
    rho_b = use[:, 2] / use[:, 3] * SIG ** 3
    rho_l = np.maximum(rho_a, rho_b)       # denser box per sample
    rho_v = np.minimum(rho_a, rho_b)

    snap = os.path.join(REPO, ".xc_snapshots",
                        f"gibbs_vle_{args.nbox}x2_{args.steps}"
                        f"_seed{args.seed}.rows.txt")
    os.makedirs(os.path.dirname(snap), exist_ok=True)
    np.savetxt(snap, np.asarray(samples),
               header="N_a V_a N_b V_b (per corrtime, full run)")
    _log(f"rows saved: {snap}")

    def tau_int(x):
        """Integrated autocorrelation time in samples (0.05 cutoff)."""
        x = np.asarray(x, float) - np.mean(x)
        n = len(x)
        var = np.dot(x, x) / n
        if var == 0:
            return 0.5
        tau = 0.5
        for k in range(1, n // 3):
            c = np.dot(x[:-k], x[k:]) / ((n - k) * var)
            if c < 0.05:
                break
            tau += c
        return tau

    def block_stats(x, nblock=10):
        nb_ = min(nblock, len(x))
        blocks = np.array_split(x, nb_)
        means = np.asarray([b.mean() for b in blocks])
        return float(x.mean()), float(means.std(ddof=1) / np.sqrt(nb_))

    out = {}
    verdicts = []
    for name, arr in (("rho_l", rho_l), ("rho_v", rho_v)):
        mean, berr = block_stats(arr)
        # tau-corrected sdom: the liquid density's slow volume-walk modes
        # make 10-block errors optimistic when tau approaches the block
        # length (VERDICT r4 weak item 3) — use the larger of the two
        tau = tau_int(arr)
        terr = float(arr.std(ddof=1) * np.sqrt(2 * tau / len(arr)))
        err = max(berr, terr)
        lit, lit_err = LIT[name]
        comb = float(np.hypot(err, lit_err))
        nsig = abs(mean - lit) / comb if comb else float("inf")
        out[name] = (mean, err, nsig)
        verdicts.append(nsig)
        _log(f"{name}* = {mean:.4f} +- {err:.4f}   (block {berr:.4f}, "
             f"tau-corrected {terr:.4f} at tau_int {tau:.1f} samples)   "
             f"literature {lit:.4f} +- {lit_err:.4f}   ({nsig:.2f} sigma)")
    acc = np.asarray(carry.accept)
    _log(f"volume-move accepts: {acc[5]:.0f}; transfer accepts: "
         f"{acc[0]:.0f}; displace accepts: {acc[2]:.0f}")
    ok = all(v < 3.0 for v in verdicts)
    print({"T_star": TSTAR, "rho_l": out["rho_l"], "rho_v": out["rho_v"],
           "pass": ok})
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
