"""Pure-JVM thread-scaling probe: documents the sandbox VM's hardware
ceiling, independent of any engine code.

Runs sha2+crc32 over ``spark.range`` (no shuffle, no IO, no Python) at a
ladder of local[N] levels and prints one JSON line with the best-of-k
seconds per level and the step efficiencies. If THIS doesn't scale N→4N,
no Spark job on this VM can — the probe is the evidence that a sub-0.8
step in the engine ladder is the machine (vCPU oversubscription by
co-tenants), not the engine's plan shape.

Usage: python scripts/jvm_probe.py [levels=1,2,4,8,16,32] [rows=200000000] [repeats=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

PROBE = r"""
import sys, time, os
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
sys.path.insert(0, {repo!r})
from plugin_singer_spark.session import get_spark
from pyspark.sql import functions as F
n, rows, reps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(app_name="jvm-probe", master=f"local[{{n}}]".format(n=n), shuffle_partitions=n)
best = None
for i in range(reps + 1):  # +1 untimed JIT warmup
    t0 = time.time()
    spark.range(0, rows, 1, max(n, 1) * 4).select(
        F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256)))
    ).collect()
    dt = time.time() - t0
    if i > 0:
        best = dt if best is None else min(best, dt)
print("PROBE", best)
"""


def main() -> None:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8,16,32").split(",")]
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = PROBE.format(repo=repo)
    secs: dict[int, float] = {}
    for n in levels:
        out = subprocess.run(
            [sys.executable, "-c", script, str(n), str(rows), str(repeats)],
            capture_output=True, text=True, timeout=1800,
        )
        for line in out.stdout.splitlines():
            if line.startswith("PROBE"):
                secs[n] = round(float(line.split()[1]), 3)
        print(f"  local[{n}]: {secs.get(n)}s", file=sys.stderr)
    steps = {}
    for a in levels:
        for b in levels:
            if b == 4 * a and a in secs and b in secs:
                steps[f"{a}->{b}"] = round(secs[a] / secs[b] / 4, 3)
    print(json.dumps({"rows": rows, "repeats": repeats,
                      "best_sec_per_level": {str(k): v for k, v in secs.items()},
                      "step_efficiency_Nto4N": steps}))


if __name__ == "__main__":
    main()
