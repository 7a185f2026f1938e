"""Endurance evidence: a long MOR replay (default 32 epochs,
compact_every=8) at a fixed parallelism, checking that amortized
throughput stays flat across the run (no delta-accumulation drift) and
recording manifest sizes per commit (the SCALE.md manifest budget).

Prints ONE JSON line:
  epoch_secs, first/second-half amortized ev/s + ratio, manifest byte
  stats per commit, final table stats.

Usage:  BENCH_BINLOG_DIR=/dev/shm/endurance python scripts/endurance.py \
            [events=8000000] [epochs=32] [cpus=8] [compact_every=8] [rotate=0]

``rotate=N`` switches periodic compaction to the staggered profile
(ingest/streaming.py:_rotation_shard): each wave compacts only the 1/N
bucket shard whose turn it is — flat wave cost instead of O(table)
(VERDICT r4 next #7).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    rotate = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    from pyspark.sql import types as T

    from plugin_singer_spark.datagen import BinlogSpec
    from plugin_singer_spark.datagen.binlog import write_singer_jsonl
    from plugin_singer_spark.ingest.streaming import replay_files
    from plugin_singer_spark.lake import LakeTable

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    os.environ.setdefault("SPARK_GRAFT_SHM_SCRATCH", "1")
    from plugin_singer_spark.session import get_spark

    spark = get_spark(
        app_name="endurance",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = BinlogSpec(num_events=events, num_repos=500, paths_per_repo=2000, num_partitions=64)
    blog_dir = os.environ.get("BENCH_BINLOG_DIR") or tempfile.mkdtemp(prefix="endurance_binlog_")
    jsonl_dir = os.path.join(blog_dir, "jsonl")
    if not os.path.exists(os.path.join(jsonl_dir, "_SUCCESS")):
        write_singer_jsonl(spark, spec, jsonl_dir)
    n_files = len(glob.glob(os.path.join(jsonl_dir, "part-*")))
    files_per_batch = max(1, n_files // epochs)

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
    )
    record_schema = T.StructType(list(schema.fields) + [T.StructField("op", T.StringType())])
    # table staged per BENCH_TABLE_DIR (default tmpfs, same argument as
    # bench.py): a 32-epoch run leaves ~20 GB of retained snapshots behind;
    # on the sandbox's single disk the kernel's dirty-page writeback of
    # that backlog collides with the later compactions (measured: the 4th
    # compaction 58 s disk-backed vs ~12 s without the backlog) — an IO
    # artifact of the shared disk, not engine drift (steady epochs stay
    # flat either way). Real deployments write to distributed storage.
    table_stage = os.environ.get("BENCH_TABLE_DIR") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    root = tempfile.mkdtemp(prefix="endurance_table_", dir=table_stage)
    table = LakeTable.create(
        spark, os.path.join(root, "repos"), schema, ["repo", "path"], num_buckets=64
    )

    # untimed warmup into a throwaway table (JIT/codegen — same as bench.py)
    wroot = tempfile.mkdtemp(prefix="endurance_warm_")
    wtable = LakeTable.create(
        spark, os.path.join(wroot, "repos"), schema, ["repo", "path"], num_buckets=64
    )
    replay_files(
        spark, wtable, jsonl_dir, files_per_batch=2, checkpoint_id="warm",
        input_format="jsonl", record_schema=record_schema, mode="mor",
        final_compact=True, max_batches=1, dedup=False,
    )
    shutil.rmtree(wroot, ignore_errors=True)

    t0 = time.time()
    stats = replay_files(
        spark, table, jsonl_dir, files_per_batch=files_per_batch,
        checkpoint_id="endurance", input_format="jsonl", record_schema=record_schema,
        mode="mor", compact_every=compact_every, final_compact=True, dedup=False,
        compact_rotate=rotate or None,
    )
    wall = time.time() - t0

    # flatness: amortized ev/s of the first half of epochs vs the second
    # (mid-replay compactions are inside their epoch's time, so the halves
    # carry equal compaction burden when epochs % (2*compact_every) == 0)
    half = stats.batches // 2
    ev_per_epoch = [rep.record_count for rep in stats.reports]
    eps_first = sum(ev_per_epoch[:half]) / sum(stats.epoch_secs[:half])
    eps_second = sum(ev_per_epoch[half:]) / sum(stats.epoch_secs[half:])

    # burst-robust drift metric on this shared VM: per-half MEDIAN of the
    # STEADY epochs only (compaction epochs are listed separately in
    # epoch_secs — their cost is bounded by the fixed 8-deltas/bucket fold,
    # not by run age). A co-tenant burst landing in one half skews the
    # mean-based halves 2×; the median ignores it, so steady_half_ratio is
    # the drift signal and half_ratio the raw throughput split.
    import statistics as _st

    steady = [
        (i, s) for i, s in enumerate(stats.epoch_secs)
        if (i + 1) % compact_every != 0
    ]
    med_first = _st.median(s for i, s in steady if i < half)
    med_second = _st.median(s for i, s in steady if i >= half)

    meta = os.path.join(root, "repos", "_meta")
    manifest_bytes = {
        os.path.basename(p): os.path.getsize(p)
        for p in sorted(glob.glob(os.path.join(meta, "version-*.json")))
    }
    sizes = list(manifest_bytes.values())
    tstats = table.stats()
    print(json.dumps({
        "events": stats.events,
        "epochs": stats.batches,
        "cpus": cpus,
        "compact_every": compact_every,
        "compact_rotate": rotate,
        "wall_sec": round(wall, 1),
        "amortized_eps": round(stats.events / (sum(stats.epoch_secs) + stats.final_compact_sec), 1),
        "eps_first_half": round(eps_first, 1),
        "eps_second_half": round(eps_second, 1),
        "half_ratio": round(eps_second / eps_first, 3),
        "steady_epoch_median_first_half": round(med_first, 3),
        "steady_epoch_median_second_half": round(med_second, 3),
        "steady_half_ratio": round(med_second / med_first, 3),
        "epoch_secs": stats.epoch_secs,
        "final_compact_sec": stats.final_compact_sec,
        "manifest_bytes": {"min": min(sizes), "max": max(sizes), "mean": round(sum(sizes) / len(sizes)), "last": sizes[-1], "n": len(sizes)},
        "table": {"base_rows": tstats["base_rows"], "snapshot": table.current_version()},
    }))
    shutil.rmtree(root, ignore_errors=True)
    if not os.environ.get("BENCH_BINLOG_DIR"):
        shutil.rmtree(blog_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
