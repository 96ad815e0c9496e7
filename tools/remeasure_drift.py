"""Re-measure the two metrics that drifted in BENCH_r04 (VERDICT r4
weak item 2): PIMC bead sweeps/s (4,535 -> 4,330, -4.5%) and the Thole
SCF solve (6.7 -> 6.9 ms), each against `.bench_expected.json`
best-known-good.

Runs the exact bench.py segment functions several times in one process
(compiles once, then repeated timed segments) so the within-process
spread separates tunnel/host noise from a real regression:

- spread across repeats >~ the drift  -> noise; record the range.
- tight repeats all at the drifted value -> real; find the cause or
  re-baseline with a written cause (docs/PERF.md).

The PIMC segment's compiles are small (pi001 scale) so this also runs
during remote-compile brownouts that block flagship-size kernels; pass
--skip-thole then (the A=10,240 SCF needs the big Mosaic compile).

Usage: python -m tools.remeasure_drift [--repeats 4] [--skip-thole]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_T0 = time.time()


def _log(m):
    print(f"[drift {time.time() - _T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--skip-thole", action="store_true")
    args = ap.parse_args()

    import bench

    out = {}
    pimc = []
    for i in range(args.repeats):
        v = bench.pimc_sweeps_per_sec()
        pimc.append(round(v, 1))
        _log(f"pimc[{i}] = {v:.1f} sweeps/s")
    out["pimc_bead_sweeps_per_sec"] = pimc

    if not args.skip_thole:
        thole = []
        for i in range(args.repeats):
            v = bench.thole_solve_ms()
            thole.append(round(v, 2))
            _log(f"thole[{i}] = {v:.2f} ms")
        out["thole_solve_ms_10240"] = thole

    exp = json.load(open(os.path.join(os.path.dirname(bench.__file__),
                                      ".bench_expected.json")))
    out["expected"] = {k: v["value"] for k, v in exp["metrics"].items()
                       if k in ("pimc_bead_sweeps_per_sec",
                                "thole_solve_ms_10240")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
