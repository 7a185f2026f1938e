"""Scaling-efficiency evidence (north rule): run the identical CDC replay at
two parallelism levels (N and 4N cores) on the identical deterministic
binlog, report throughput at each and efficiency = (T_N / T_4N) / 4.

Writes BENCH/BASELINE.md. Usage: python scripts/bench_scaling.py [N] [events]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_level(cpus: int, events: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_EVENTS=str(events),
        BENCH_ONLY_REPLAY="1",
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
    lo = run_level(n, events)
    hi = run_level(4 * n, events)
    t_lo, t_hi = lo["queries"]["cdc_replay"], hi["queries"]["cdc_replay"]
    eff = (t_lo / t_hi) / 4
    result = {
        "events": events,
        f"local[{n}]": {"sec": t_lo, "events_per_sec": lo["value"]},
        f"local[{4*n}]": {"sec": t_hi, "events_per_sec": hi["value"]},
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule_0.8": eff >= 0.8,
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — CDC replay scaling evidence (north rule)

Same job, same deterministic synthetic binlog ({events:,} change events,
skewed: mega-repo ≈20% of events), two parallelism levels — the sandbox
stand-in for N vs 4N executors (`BASELINE.json` north_rule).

| level | replay sec | events/sec |
|---|---|---|
| local[{n}] | {t_lo} | {lo['value']:,} |
| local[{4*n}] | {t_hi} | {hi['value']:,} |

**Scaling efficiency** = (T_N / T_4N) / 4 = **{eff:.3f}** (target ≥ 0.8).

Correctness invariants (checked in pytest / CORRECTNESS gate): final-state
sha256(content) parity vs the oracle, bookmark-resume, epoch-fenced
idempotent replay.

Reproduce: `python scripts/bench_scaling.py {n} {events}`
"""
        )


if __name__ == "__main__":
    main()
