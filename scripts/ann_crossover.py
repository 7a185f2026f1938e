"""ANN crossover evidence: exact brute-force top-k vs auto-planes LSH top-k
at growing corpus sizes.

At the sandbox's tiny embeddings table (2k vectors) the exact scan is
trivially fast and the bucketed path's fixed overhead (python-kernel spin-up
+ two shuffles) dominates — the interesting question is where the curves
cross. This script synthesizes deterministic clustered corpora (md5-derived
centers + noise, no RNG) at several sizes, runs both paths with identical
queries, and prints one JSON line per size. Results are recorded in
BENCH/BASELINE.md (the `ann-crossover` appendix section, maintained via
scripts/benchdoc.py so bench_scaling's BASELINE.md rewrites keep it) and
BENCH/ann_crossover.json.

Cost model being verified: exact is O(|Q|·|C|) per batch of queries; LSH is
O(|Q|·tables·(1+multiprobe)·target_bucket) — constant in |C| — plus the
linear corpus bucketing pass.

Usage: python scripts/ann_crossover.py [sizes...]   (default 2000 20000 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # benchdoc

DIM = 64
N_CLUSTERS = 256
N_QUERIES = int(os.environ.get("ANN_QUERIES", "20"))


def synth_embeddings(spark, n: int):
    """Deterministic clustered vectors: v[d] = 0.75·center(id%256, d) +
    0.25·noise(id, d), every component md5-derived (same on any run/cluster
    size — the repo's standard seedless determinism)."""
    from pyspark.sql import functions as F

    def u(seed_col, d):
        return (
            F.pmod(F.xxhash64(F.lit("ann"), seed_col, F.lit(d)), F.lit(2_000_000))
            / 1_000_000.0
            - 1.0
        )

    df = spark.range(n).select(F.col("id").alias("vec_id"))
    comps = [
        (0.75 * u(F.pmod(F.col("vec_id"), F.lit(N_CLUSTERS)), d) + 0.25 * u(F.col("vec_id") + 1_000_000_007, d)).cast("float")
        for d in range(DIM)
    ]
    return df.select("vec_id", F.array(*comps).alias("embedding"))


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [2_000, 20_000, 100_000]
    from pyspark.sql import functions as F

    from plugin_singer_spark.operators import similarity as sim
    from plugin_singer_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ann-crossover", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the python workers + codegen paths once, untimed
    warm = synth_embeddings(spark, 1000).cache()
    wq = warm.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    sim.brute_force_topk(warm, wq, k=5).count()
    sim.lsh_topk(warm, wq, dim=DIM, k=5, corpus_count=1000).count()
    warm.unpersist()

    results = []
    for n in sizes:
        emb = synth_embeddings(spark, n).cache()
        emb.count()
        q = emb.filter(F.col("vec_id") % (n // N_QUERIES) == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        c = emb.filter(F.col("vec_id") % (n // N_QUERIES) != 0)
        t0 = time.time()
        e = {(r["query_id"], r["vec_id"]) for r in sim.brute_force_topk(c, q, k=5).collect()}
        t_exact = time.time() - t0
        t0 = time.time()
        a = {(r["query_id"], r["vec_id"]) for r in sim.lsh_topk(c, q, dim=DIM, k=5, corpus_count=n).collect()}
        t_lsh = time.time() - t0
        planes, tables, multiprobe = sim.resolve_lsh_config(n, N_QUERIES)
        rec = {
            "n": n,
            "planes": planes,
            "tables": tables,
            "multiprobe": multiprobe,
            "exact_sec": round(t_exact, 2),
            "lsh_sec": round(t_lsh, 2),
            "speedup": round(t_exact / t_lsh, 2),
            "recall": round(len(e & a) / len(e), 3) if e else None,
        }
        results.append(rec)
        print(json.dumps(rec))
        emb.unpersist()
        spark.catalog.clearCache()

    from plugin_singer_spark.operators.stagecache import release_stage_caches

    release_stage_caches()
    import benchdoc  # scripts/benchdoc.py (same dir)

    os.makedirs(benchdoc.BENCH_DIR, exist_ok=True)
    with open(os.path.join(benchdoc.BENCH_DIR, "ann_crossover.json"), "w") as f:
        json.dump({"dim": DIM, "queries": N_QUERIES, "cpus": cpus, "results": results}, f, indent=1)
    rows = "\n".join(
        f"| {r['n']:,} | {r['planes']} | {r['tables']}/{r['multiprobe']} | "
        f"{r['exact_sec']} | {r['lsh_sec']} | {r['speedup']}× | {r['recall']} |"
        for r in results
    )
    benchdoc.set_section(
        "ann-crossover",
        f"""## ANN exact↔LSH crossover (scripts/ann_crossover.py)

Deterministic clustered corpora (dim={DIM}, {N_QUERIES} queries, k=5,
auto-derived planes, local[{cpus}]): exact brute-force cosine top-k vs the
auto-planes LSH path on identical inputs. The bucketed path's per-query
candidate volume is constant in |corpus| (≈ tables×(1+multiprobe)×
target_bucket), so its curve is flat where exact grows linearly — the
crossover is where the index pays for its fixed overhead.

Tables/multiprobe auto-derive from the RECALL-FLOOR rule
(`sim.auto_lsh_params`, VERDICT r4 #2): as planes grow with the corpus,
table count grows to hold recall ≥0.9 for neighbors at the 0.92-cosine
design point instead of decaying (r4: 0.95→0.92→0.88).

| corpus | planes | tables/probe | exact sec | LSH sec | LSH speedup | LSH recall@5 |
|---|---|---|---|---|---|---|
{rows}

Reproduce: `python scripts/ann_crossover.py {' '.join(str(r['n']) for r in results)}`
(raw JSON in BENCH/ann_crossover.json).""",
    )


if __name__ == "__main__":
    main()
