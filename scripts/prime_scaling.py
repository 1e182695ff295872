#!/usr/bin/env python
"""Prime bench.py's scaling cache without re-running the sf0.1 suite.

Runs the IDENTICAL leg protocol (bench._LEG_SCRIPT via bench._run_leg on
bench._scaling_corpus()) under the identical pre-declared steal gate and
quota rule, and writes .bench_cache/scaling.json keyed with
bench._code_key() — so a subsequent `python bench.py` (including the
driver's) reuses the measured legs instead of re-spending ~30 minutes.

The only addition over bench.py's own loop is a cheap PRE-probe: before
burning a 3-11 minute leg, sample aggregate /proc/stat steal for a few
seconds and, if the window is already dirtier than the gate, sleep and
re-probe instead of running a leg that the post-hoc gate would reject
anyway.  The accept/reject rule applied to every sample that DOES run is
bit-identical to bench.py's (same threshold, same aggregate-steal field
measured over the leg itself), so the artifact's selection semantics are
unchanged — the probe only saves wall-clock in co-tenant bursts, it
never admits a sample the gate would refuse nor refuses one it would
admit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the leg protocol + cache key live there)


def probe_steal(seconds: float = 4.0) -> float:
    def ticks():
        vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(vals), (vals[7] if len(vals) > 7 else 0)

    t0, s0 = ticks()
    time.sleep(seconds)
    t1, s1 = ticks()
    return (s1 - s0) / max(1, t1 - t0)


def main() -> None:
    t_start = time.time()
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "9000"))
    reps_big = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3")))
    reps_small = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_REPS_SMALL", "2")))
    steal_reject = float(os.environ.get("SPARK_GRAFT_STEAL_REJECT", "0.005"))

    path = bench._scaling_corpus()
    key = bench._code_key()
    print(f"[prime] corpus={path} key={key} budget={budget:.0f}s", flush=True)

    small_runs: list[dict] = []
    big_runs: list[dict] = []
    rejected: list[dict] = []
    attempts = {2: 0, 8: 0}
    while True:
        need_big = reps_big - len(big_runs)
        need_small = reps_small - len(small_runs)
        if need_big <= 0 and need_small <= 0:
            break
        # Keep ATTEMPTS proportional to quota rather than gating small
        # legs on big-leg acceptance: in a persistently-bursty window
        # (every sample rejected) bench.py's acceptance-driven order
        # would never run a 2-core leg at all, leaving the all-samples
        # fallback with nothing to pair.  Proportional attempts
        # guarantee both legs accumulate same-window evidence.
        if need_big <= 0:
            cores = 2
        elif need_small <= 0:
            cores = 8
        else:
            cores = 8 if attempts[8] / reps_big <= attempts[2] / reps_small else 2
        done = small_runs + big_runs + rejected
        if done:
            est = max(
                (r["sec"] for r in done if r["cores"] == cores),
                default=done[-1]["sec"] * (3 if cores == 2 else 1),
            )
            if time.time() - t_start + est > budget:
                print("[prime] budget out", flush=True)
                break
        # pre-probe: don't burn a leg inside a visible co-tenant burst
        amb = probe_steal()
        if amb > steal_reject:
            print(f"[prime] ambient steal {amb:.4f} > gate; waiting 60s", flush=True)
            if time.time() - t_start + 60 > budget:
                print("[prime] budget out (waiting)", flush=True)
                break
            time.sleep(60)
            continue
        print(f"[prime] leg cores={cores} (ambient {amb:.4f})", flush=True)
        attempts[cores] += 1
        leg = bench._run_leg(cores, path)
        if not leg:
            print("[prime] leg produced no result", flush=True)
            continue
        print(f"[prime] LEG {json.dumps(leg)}", flush=True)
        if leg.get("steal_agg", 0.0) > steal_reject:
            leg["rejected_steal"] = True
            rejected.append(leg)
            continue
        (big_runs if cores == 8 else small_runs).append(leg)

    scaling = bench.build_scaling_block(small_runs, big_runs, rejected, steal_reject)
    if scaling is None:
        print("[prime] FAILED: no usable sample pair; cache not written", flush=True)
        sys.exit(1)

    os.makedirs(bench.CACHE, exist_ok=True)
    with open(os.path.join(bench.CACHE, "scaling.json"), "w") as fh:
        json.dump({"key": key, "scaling": scaling}, fh)
    bench._write_evidence(scaling)
    print("[prime] SCALING " + json.dumps(scaling), flush=True)


if __name__ == "__main__":
    main()
