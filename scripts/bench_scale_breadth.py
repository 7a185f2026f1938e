"""Corpus-growth snapshot for the heaviest breadth operators: the same
driver queries at 1× and 10× the sf0.1 corpus (VERDICT r3 "Next round" #9
— evidence that the auto-planes constant-candidate claim holds as |corpus|
grows).

The 10× corpus derives deterministically from sf0.1 so the per-document
structure is IDENTICAL at both scales:

- documents: 10 copies; copy c suffixes every whitespace token with
  ``x<c>`` — within-copy shingle structure (hence the true near-dup pair
  set) is preserved exactly, while copies share zero shingles, so ground
  truth scales exactly 10×.
- embeddings: 10 copies; copy c reflects coordinates by a fixed
  md5-derived ±1 sign vector — an isometry, so within-copy cosine
  structure is exact, while cross-copy cosines are sign-scrambled noise.

Queries (and their query SETS, for the ANN paths) scale 10× with the
corpus, so a linear operator shows t(10×)/t(1×) ≈ 10, and the exact ANN
scan — |Q|×|C| — shows ≈ 100. Results land in BENCH/BASELINE.md (the
`sf-scaling` appendix, via scripts/benchdoc.py) + BENCH/sf_scaling.json.

Usage: python scripts/bench_scale_breadth.py [factor] [sf_dir]
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

import hashlib

QUERIES = [
    "minhash_lsh_pairs",
    "dedup_clusters_lsh",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup_lsh",
    "ann_topk",  # exact contrast: |Q|x|C| should scale ~factor^2
]

OFFSET = 10_000_000


def build_scaled(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])

    doc_copies = []
    emb_copies = []
    for c in range(factor):
        if c == 0:
            doc_copies.append(docs)
            emb_copies.append(emb)
            continue
        txt = F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{c}")
        doc_copies.append(
            docs.select(
                (F.col("doc_id") + c * OFFSET).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
                F.length(txt).alias("n_chars"),
            )
        )
        signs = [
            1.0 if int(hashlib.md5(f"sgn:{c}:{d}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        emb_copies.append(
            emb.select(
                (F.col("vec_id") + c * OFFSET).alias("vec_id"),
                F.array(
                    *[(F.col("embedding")[d] * F.lit(signs[d])).cast("float") for d in range(dim)]
                ).alias("embedding"),
                *[c_ for c_ in emb.columns if c_ not in ("vec_id", "embedding")],
            )
        )
    d = doc_copies[0]
    for x in doc_copies[1:]:
        d = d.unionByName(x)
    e = emb_copies[0]
    for x in emb_copies[1:]:
        e = e.unionByName(x)
    d.repartition(max(4, 4 * factor)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    e.repartition(max(4, 2 * factor)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from plugin_singer_spark.operators.stagecache import release_stage_caches
    from plugin_singer_spark.session import get_spark

    import __spark_entry__ as entry
    import benchdoc

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    spark = get_spark(app_name="scale-breadth", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    stage = tempfile.mkdtemp(
        prefix="scale_breadth_", dir=("/dev/shm" if os.path.isdir("/dev/shm") else None)
    )
    dirs = {}
    for f in (1, factor):
        dirs[f] = os.path.join(stage, f"x{f}")
        build_scaled(spark, sf_dir, dirs[f], f)

    qs = entry.queries()
    results: dict[str, dict] = {}
    try:
        # untimed warmup: one 1× pass per query compiles codegen paths and
        # spins up python workers so the TIMED 1× side isn't paying JIT
        for name in QUERIES:
            qs[name](spark, dirs[1]).count()
            release_stage_caches()
            spark.catalog.clearCache()
        for name in QUERIES:
            fn = qs[name]
            per = {}
            for f in (1, factor):
                t0 = time.time()
                n = fn(spark, dirs[f]).count()
                per[f] = {"sec": round(time.time() - t0, 2), "rows": n}
                release_stage_caches()
                spark.catalog.clearCache()
            per["ratio"] = round(per[factor]["sec"] / max(per[1]["sec"], 1e-9), 2)
            results[name] = per
            print(json.dumps({"query": name, **{str(k): v for k, v in per.items()}}))
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    os.makedirs(benchdoc.BENCH_DIR, exist_ok=True)
    with open(os.path.join(benchdoc.BENCH_DIR, "sf_scaling.json"), "w") as f:
        json.dump({"factor": factor, "sf_dir": sf_dir, "cpus": cpus, "results": results}, f, indent=1)

    rows = "\n".join(
        f"| {q} | {r[1]['sec']} | {r[1]['rows']:,} | {r[factor]['sec']} | "
        f"{r[factor]['rows']:,} | {r['ratio']}× |"
        for q, r in results.items()
    )
    benchdoc.set_section(
        "sf-scaling",
        f"""## Corpus-growth snapshot: heaviest breadth queries at 1× vs {factor}× sf0.1

Deterministically scaled corpus (per-copy token suffix for documents —
within-copy shingle structure exact, zero cross-copy overlap; ±1-reflected
embeddings — within-copy cosine structure exact, cross-copy cosines are
sign-scrambled noise, whose tail above the 0.35 near-dup threshold shows
in that query's rows column). Query sets scale with
the corpus, so LINEAR operators show time ratio ≈ {factor} and the exact
|Q|×|C| ANN scan ≈ {factor}²; the bucketed/inverted-list paths staying at
or below ~{factor}× is the auto-planes constant-candidate claim holding
as |corpus| grows. local[{cpus}], stage on tmpfs.

| query | 1× sec | 1× rows | {factor}× sec | {factor}× rows | time ratio |
|---|---|---|---|---|---|
{rows}

Read the contrast on the identical query set: the exact scan's ratio is
the steepest (quadratic work, only masked by fixed overhead at 1×), while
the LSH/IVF top-k paths grow at a fraction of the corpus factor — the
constant-candidate claim. The near-dup query's output itself grows
super-{factor}× (cross-copy noise-pair tail), so its time ratio bounds
output growth, not per-row cost.

Reproduce: `python scripts/bench_scale_breadth.py {factor}`
(raw JSON in BENCH/sf_scaling.json).""",
    )


if __name__ == "__main__":
    main()
