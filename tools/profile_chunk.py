"""Per-op profile of one flagship MC chunk on the live backend.

Makes the round-2/3 profiling workflow (docs/PERF.md "Profiling recipe")
a committed tool instead of prose: runs one compiled corrtime chunk of
the flagship GCMC under ``jax.profiler.trace``, parses the resulting
``*.trace.json.gz``, and prints

- the top ops by summed device duration (one line per fused op name),
- the same durations re-keyed by HLO metadata source line when present
  (``source_file=... source_line=N`` — space-separated, see CLAUDE.md),
- the ``copy.*`` total, the historical tell for layout-conversion bugs
  (full-plane copies from column slices / cond-blocked aliasing).

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_chunk.py
            [--model co2|mono] [--top 25] [--chunk 64]

The per-move cost printed at the end is (device total)/chunk — compare
against docs/PERF.md's budget table.  Run one probe at a time: two
concurrent TPU processes contend on the remote tunnel.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="co2", choices=("co2", "mono"))
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--donate", action="store_true",
                    help="planes-only donation (the production config)")
    ap.add_argument("--dump-hlo", metavar="PATH", default=None,
                    help="write the backend-compiled HLO text to PATH and "
                         "exit (no trace). Grep it for the profiled op "
                         "names (conditional.N, fusion.N) and read their "
                         "metadata source_file/source_line.")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import flagship
    from mpmcxx_tpu.mc import chain as chain_mod

    t0 = time.time()
    if args.model == "co2":
        state, _meta, flags, params, opts = flagship.build_state_co2()
    else:
        state, _meta, flags, params, opts = flagship.build_state()
    carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
    topo = flagship.topology(state)
    runner = chain_mod.make_chunk_runner(
        flags, params, opts, args.chunk, topology=topo,
        donate="planes" if args.donate else False)
    if args.dump_hlo:
        print(f"[{time.time() - t0:6.1f}s] lowering + compiling for HLO "
              f"dump...", flush=True)
        txt = runner.lower_hlo(carry).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"[{time.time() - t0:6.1f}s] wrote {len(txt)} bytes to "
              f"{args.dump_hlo}", flush=True)
        return

    print(f"[{time.time() - t0:6.1f}s] compiling + warming one chunk...",
          flush=True)
    carry, _ = runner(carry)
    float(carry.obs.energy)          # force remote completion
    print(f"[{time.time() - t0:6.1f}s] warm; tracing one chunk",
          flush=True)

    logdir = tempfile.mkdtemp(prefix="jxtrace_")
    with jax.profiler.trace(logdir):
        carry, _ = runner(carry)
        float(carry.obs.energy)

    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        print("no trace produced", file=sys.stderr)
        sys.exit(1)
    ev = json.load(gzip.open(files[-1]))["traceEvents"]

    # device-lane complete events: sum by op name and by source line
    by_name = collections.Counter()
    by_src = collections.Counter()
    n_by_name = collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        # host-side python/runtime lanes have pid metadata elsewhere; the
        # XLA op lanes carry args with source metadata — keep every lane
        # but skip obvious host frames
        if name.startswith("$") or "/python" in name:
            continue
        dur = e.get("dur", 0) / 1e3          # us -> ms
        by_name[name] += dur
        n_by_name[name] += 1
        a = e.get("args") or {}
        if "source_file" in a:
            by_src[f"{a['source_file']}:{a.get('source_line')}"] += dur
        else:
            # some jax versions pack it into one space-separated string
            v = a.get("metadata")
            if isinstance(v, str) and "source_file=" in v:
                by_src[v[v.index("source_file="):][:120]] += dur

    total = sum(by_name.values())
    print(f"\n== top {args.top} ops by summed device time "
          f"(one {args.chunk}-move chunk) ==")
    for name, ms in by_name.most_common(args.top):
        print(f"{ms:9.3f} ms  x{n_by_name[name]:<5d} {name[:90]}")
    copies = sum(ms for n, ms in by_name.items() if n.startswith("copy"))
    print(f"\ncopy.* total: {copies:.3f} ms/chunk "
          f"({copies / args.chunk * 1e3:.1f} us/move)")
    if by_src:
        print(f"\n== top 15 source lines ==")
        for src, ms in by_src.most_common(15):
            print(f"{ms:9.3f} ms  {src[:100]}")
    print(f"\ndevice total: {total:.1f} ms/chunk -> "
          f"{total / args.chunk:.3f} ms/move "
          f"({args.chunk / (total / 1e3):.1f} moves/s device-side)")


if __name__ == "__main__":
    main()
