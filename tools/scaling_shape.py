"""Shape-check the multi-chip scaling model on the virtual CPU mesh.

docs/PERF.md's "Multi-chip scaling model" predicts the sharded SCF's
per-device work scales ~1/n_dev until the local tile work shrinks to
per-tile overhead (~4-8 chips at 10k atoms with b=512 tiles), with a
small replicated remainder (k-space recip + the all_gather'd [A,3]
dipole field).  No multi-chip hardware is reachable, but the SPMD
compiled module's per-device cost analysis (flops / bytes accessed)
measures exactly the work-split shape that claim is about: fitting
work(n_dev) = replicated + sharded/n_dev against n_dev = 1,2,4,8 tests
whether the model's decomposition (and its flattening point) is right,
independent of wall-clock.

Usage: python -m tools.scaling_shape [--atoms 4096] [--block 512]
Prints a table + the fitted replicated fraction; results go into
docs/PERF.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)

_T0 = time.time()


def _log(m):
    print(f"[scaling_shape {time.time() - _T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)


def build_system(n_atoms: int, L: float = 60.0, seed: int = 5):
    import numpy as np
    from mpmcxx_tpu.state import AtomRecord, build_state
    rng = np.random.default_rng(seed)
    atoms = []
    n_mol = n_atoms // 2
    for m in range(n_mol):
        base = rng.uniform(-L / 2, L / 2, 3)
        for a in range(2):
            off = rng.normal(0, 0.8, 3)
            atoms.append(AtomRecord(
                "X", "MOL", m + 1, x=base[0] + off[0], y=base[1] + off[1],
                z=base[2] + off[2], mass=16.0,
                charge=408.7816 * (0.15 if a % 2 else -0.15),
                polarizability=0.4, epsilon=80.0, sigma=3.1))
    return build_state(atoms, np.eye(3) * L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--ndevs", default="1,2,4,8")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mpmcxx_tpu import FFlags, RunParams
    from mpmcxx_tpu.parallel import replicas as rep
    from mpmcxx_tpu.parallel.sharded_energy import sharded_breakdown

    state, _ = build_system(args.atoms)
    _log(f"A = {state.n_atom_slots} slots ({args.atoms} atoms), "
         f"block = {args.block}")
    flags = FFlags(polarization=True, polar_iterative=True, polar_ewald=True,
                   polar_mixed=True, polar_max_iter=4)
    params = RunParams(temperature=140.0, ewald_alpha=3.5 / 30.0,
                       polar_ewald_alpha=3.5 / 30.0, polar_damp=2.1304,
                       polar_gamma=1.0)

    rows = {}
    for nd in [int(x) for x in args.ndevs.split(",")]:
        mesh = rep.make_mesh(nd)
        fn = jax.jit(lambda s, mesh=mesh: sharded_breakdown(
            s, flags, params, mesh, block=args.block))
        t0 = time.time()
        compiled = fn.lower(state).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        # correctness anchor: all n_dev give the same energy
        e = float(compiled(state).polarization)
        rows[nd] = {"flops": flops, "bytes": bytes_acc, "epol": e,
                    "compile_s": round(time.time() - t0, 1)}
        _log(f"n_dev={nd}: flops/dev {flops:.3e}  bytes/dev {bytes_acc:.3e}"
             f"  E_pol {e:.6f}  (compile {rows[nd]['compile_s']}s)")

    nds = sorted(rows)
    e0 = rows[nds[0]]["epol"]
    for nd in nds[1:]:
        assert abs(rows[nd]["epol"] - e0) < 1e-6 * max(abs(e0), 1.0), \
            f"sharded energy mismatch at n_dev={nd}"

    # fit work(n) = repl + shard/n  (least squares over 1/n)
    import numpy as np
    out = {"atoms": args.atoms, "block": args.block, "per_dev": rows}
    for key in ("flops", "bytes"):
        y = np.asarray([rows[nd][key] for nd in nds], float)
        x = np.asarray([1.0 / nd for nd in nds])
        A = np.stack([np.ones_like(x), x], 1)
        (repl, shard), *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = y - (repl + shard * x)
        rel = float(np.abs(resid).max() / y.max())
        # n at which the replicated part equals the sharded part: beyond
        # this, adding chips less-than-halves the remaining work
        n_flat = shard / max(repl, 1e-30)
        out[f"fit_{key}"] = {
            "replicated": float(repl), "sharded": float(shard),
            "replicated_frac_at_1": float(repl / (repl + shard)),
            "fit_rel_err": rel, "n_dev_flatten": float(n_flat)}
        print(f"{key}: work(n) = {repl:.3e} + {shard:.3e}/n  "
              f"(repl frac @1 dev {repl / (repl + shard):.1%}, "
              f"max rel fit err {rel:.1%}) -> flattens past "
              f"n ~ {n_flat:.1f} devices")
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
