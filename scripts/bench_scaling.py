"""Scaling-efficiency evidence (north rule): run the identical CDC replay at
two parallelism levels (N and 4N cores) on the identical deterministic
binlog, report throughput at each and efficiency = (T_N / T_4N) / 4.

Measurement protocol for this noisy shared VM: the binlog is generated ONCE
and replayed by every run; each level runs ``repeats`` times in alternating
order (4N, N, N, 4N, ...) and the MIN time per level is reported — min is
the standard estimator when interference is strictly additive.

Writes BENCH/BASELINE.md. Usage:
  python scripts/bench_scaling.py [N] [events] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def run_level(cpus: int, events: int, binlog_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_EVENTS=str(events),
        BENCH_ONLY_REPLAY="1",
        BENCH_BINLOG_DIR=binlog_dir,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        BENCH_BATCH_EVENTS=os.environ.get("BENCH_BATCH_EVENTS", str(max(events // 4, 500_000))),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench at local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    events = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("BENCH_EVENTS", "2000000"))
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    binlog_dir = os.environ.get("BENCH_BINLOG_DIR") or tempfile.mkdtemp(prefix="bench_binlog_shared_")
    runs: dict[int, list[dict]] = {n: [], 4 * n: []}
    order: list[int] = []
    for i in range(repeats):
        order += [4 * n, n] if i % 2 == 0 else [n, 4 * n]
    for cpus in order:
        runs[cpus].append(run_level(cpus, events, binlog_dir))
        print(f"  local[{cpus}]: {runs[cpus][-1]['queries']['cdc_replay']}s", file=sys.stderr)
    lo = min(runs[n], key=lambda r: r["queries"]["cdc_replay"])
    hi = min(runs[4 * n], key=lambda r: r["queries"]["cdc_replay"])
    t_lo, t_hi = lo["queries"]["cdc_replay"], hi["queries"]["cdc_replay"]
    eff = (t_lo / t_hi) / 4
    result = {
        "events": events,
        "repeats": repeats,
        f"local[{n}]": {"sec": t_lo, "events_per_sec": lo["value"], "all_sec": [r["queries"]["cdc_replay"] for r in runs[n]]},
        f"local[{4*n}]": {"sec": t_hi, "events_per_sec": hi["value"], "all_sec": [r["queries"]["cdc_replay"] for r in runs[4 * n]]},
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule_0.8": eff >= 0.8,
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — CDC replay scaling evidence (north rule)

Same job, same deterministic synthetic binlog ({events:,} change events,
skewed: mega-repo ≈20% of events, generated once and replayed by every
run), two parallelism levels — the sandbox stand-in for N vs 4N executors
(`BASELINE.json` north_rule). {repeats} runs per level in alternating
order, min reported (shared-VM noise is additive).

| level | replay sec (min) | events/sec | all runs (sec) |
|---|---|---|---|
| local[{n}] | {t_lo} | {lo['value']:,} | {result[f'local[{n}]']['all_sec']} |
| local[{4*n}] | {t_hi} | {hi['value']:,} | {result[f'local[{4*n}]']['all_sec']} |

**Scaling efficiency** = (T_N / T_4N) / 4 = **{eff:.3f}** (target ≥ 0.8).

Correctness invariants (checked in pytest / CORRECTNESS gate): final-state
sha256(content) parity vs the oracle, bookmark-resume, epoch-fenced
idempotent replay.

Reproduce: `python scripts/bench_scaling.py {n} {events}`
"""
        )


if __name__ == "__main__":
    main()
