"""Evidence: CDC-maintained MinHash index vs full-corpus recompute.

At each corpus size, times (a) the batch operator finding ALL candidate
pairs from scratch and (b) folding one fixed-size CDC batch (2,000
changed docs) through the maintained index — update MERGE + bucket-join
candidates. The claim being evidenced: (a) grows with the corpus, (b)
is ~flat (O(|batch| + matched buckets)), so at a living 10^10-doc corpus
the per-day cost is the day's churn, not the corpus.

Usage: python scripts/bench_incremental_dedup.py [sizes...]
       (default 20000 100000 500000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # benchdoc

BATCH = 2_000
PARAMS = dict(n=3, num_hashes=16, bands=8)


def synth_docs(spark, lo: int, hi: int):
    """Deterministic synthetic docs: 12 md5-derived words each; ~10% of ids
    share an 11-word prefix with a partner (planted near-dups) so buckets
    and candidate joins do real work."""
    from pyspark.sql import functions as F

    base = F.when(F.col("id") % 10 == 0, F.col("id") + 1).otherwise(F.col("id"))
    words = [
        F.substring(F.md5(F.concat_ws(":", F.lit("w"), base.cast("string"), F.lit(str(j)))), 1, 8)
        for j in range(11)
    ] + [F.substring(F.md5(F.concat_ws(":", F.lit("t"), F.col("id").cast("string"))), 1, 8)]
    return (
        spark.range(lo, hi, 1, max(8, (hi - lo) // 50_000))
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text"))
    )


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [100_000, 500_000, 2_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from plugin_singer_spark.operators.dedup import minhash_lsh_pairs
    from plugin_singer_spark.operators.incremental_dedup import MinHashIndex
    from plugin_singer_spark.operators.stagecache import release_stage_caches
    from plugin_singer_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    spark = get_spark(app_name="bench-incremental-dedup", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for n in sizes:
        corpus = synth_docs(spark, 0, n)
        t0 = time.time()
        full_pairs = minhash_lsh_pairs(corpus, "doc_id", verify=False, **PARAMS).count()
        full_sec = time.time() - t0
        release_stage_caches()
        spark.catalog.clearCache()

        batch = synth_docs(spark, n, n + BATCH)
        modes = {}
        for mode in ("mor", "cow"):
            root = tempfile.mkdtemp(
                prefix="mh_bench_", dir=("/dev/shm" if os.path.isdir("/dev/shm") else None)
            )
            try:
                # index bucket count scales with the corpus (production
                # posture: bounded per-bucket resolve/compaction units)
                idx = MinHashIndex(spark, root, num_buckets=max(16, n // 50_000), **PARAMS)
                idx.update(corpus, seq=1, mode="cow")  # prefill (untimed)
                t0 = time.time()
                idx.update(batch, seq=2, mode=mode)
                batch_pairs = idx.candidates(batch).count()
                modes[mode] = round(time.time() - t0, 2)
            finally:
                shutil.rmtree(root, ignore_errors=True)
            release_stage_caches()
            spark.catalog.clearCache()

        row = {
            "corpus": n, "batch": BATCH,
            "full_sec": round(full_sec, 2), "full_pairs": full_pairs,
            "mor_sec": modes["mor"], "cow_sec": modes["cow"],
            "batch_pairs": batch_pairs,
            "speedup_vs_full": round(full_sec / max(modes["mor"], 1e-9), 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    import benchdoc

    os.makedirs(benchdoc.BENCH_DIR, exist_ok=True)
    with open(os.path.join(benchdoc.BENCH_DIR, "incremental_dedup.json"), "w") as f:
        json.dump({"cpus": cpus, "params": PARAMS, "results": results}, f, indent=1)
    lines = "\n".join(
        f"| {r['corpus']:,} | {r['full_sec']} | {r['full_pairs']:,} | "
        f"{r['mor_sec']} | {r['cow_sec']} | {r['batch_pairs']:,} | {r['speedup_vs_full']}× |"
        for r in results
    )
    benchdoc.set_section(
        "incremental-dedup",
        f"""## CDC-maintained dedup index vs full recompute (scripts/bench_incremental_dedup.py)

One fixed 2,000-doc CDC batch folded through the maintained MinHash index
(update MERGE + bucket-join candidates, operators/incremental_dedup.py)
vs the batch operator recomputing all candidate pairs from scratch
(local[{cpus}], deterministic synthetic docs, {PARAMS['num_hashes']} hashes /
{PARAMS['bands']} bands). Batch-equivalence is pytest-gated
(tests/test_incremental_dedup.py): any split folded through the index
yields exactly the batch operator's pair set.

| corpus | full recompute sec | full pairs | MOR batch sec | COW batch sec | batch pairs | MOR speedup vs full |
|---|---|---|---|---|---|---|
{lines}

What the incremental fold pays: shingle+band the 2,000 CHANGED docs
(map-side), append {PARAMS['bands']} bare delta rows/doc (MOR — no table
read on write), then one scan of the ~40-byte-row index into the bucket
join. The index scan is linear in the corpus but carries none of the
expensive work — no re-shingling, re-hashing, or re-banding of corpus
text, which is where the full recompute's time goes — so the gap widens
with corpus size. The COW column shows why MOR is the write default: a
batch spanning the id space touches every bucket, so copy-on-write
rewrites ~the whole table per batch. Deltas fold down on the standard
compact() schedule (same knobs as every stream in the job); index bucket
count scales with the corpus. Raw JSON: BENCH/incremental_dedup.json.""",
    )


if __name__ == "__main__":
    main()
