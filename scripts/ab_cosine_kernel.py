"""A/B: Arrow cosine kernel vs declarative HOF fold in the ANN hot paths.

Times lsh_topk / ivf_topk / embedding_neardup_pairs at a given corpus size
with (a) the Arrow pair_cosine_kernel and (b) a HOF-fold stand-in patched
in via monkeypatch, on identical synthetic corpora. Decides which scoring
expression each path should use. Throwaway evidence harness.

Usage: python scripts/ab_cosine_kernel.py [sizes...]   (default 400000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ann_crossover import synth_embeddings, DIM  # noqa: E402


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [400_000]
    from pyspark.sql import functions as F

    from plugin_singer_spark import session
    from plugin_singer_spark.operators import similarity as sim

    spark = session.get_spark(app_name="ab-cosine-kernel")

    arrow_kern = sim.pair_cosine_kernel

    def hof_kern():
        return lambda va, vb, na, nb: F.round(sim.dot(va, vb) / (na * nb), 6)

    def unrolled_kern():
        return lambda va, vb, na, nb: F.round(
            sim.dot_unrolled(va, vb, DIM) / (na * nb), 6
        )

    for n in sizes:
        corpus = synth_embeddings(spark, n).cache()
        corpus.count()
        queries = (
            synth_embeddings(spark, 20)
            .select(F.col("vec_id").alias("query_id"), "embedding")
            .cache()
        )
        queries.count()
        row = {"n": n}
        kernels = [("arrow", arrow_kern), ("hof", hof_kern), ("unrolled", unrolled_kern)]
        if os.environ.get("AB_KERNELS"):
            wanted = os.environ["AB_KERNELS"].split(",")
            kernels = [kv for kv in kernels if kv[0] in wanted]
        # the synthetic clustered corpus at threshold .9 yields output pairs
        # quadratic in n (9M at 100k) — cap the neardup leg so the A/B stays
        # a scoring-expression measurement, not an output-write benchmark
        paths = ("lsh", "neardup") if n <= int(os.environ.get("AB_NEARDUP_MAX", "100000")) else ("lsh",)
        for name, kern in kernels:
            sim.pair_cosine_kernel = kern
            for path in paths:
                t0 = time.time()
                if path == "lsh":
                    out = sim.lsh_topk(
                        corpus, queries, k=5, dim=DIM,
                        corpus_count=n, query_count=20,
                    )
                else:
                    out = sim.embedding_neardup_pairs(
                        corpus, dim=DIM, threshold=0.9, id_col="vec_id",
                        vec_col="embedding", corpus_count=n,
                    )
                cnt = out.count()
                row[f"{path}_{name}_s"] = round(time.time() - t0, 2)
                row[f"{path}_{name}_rows"] = cnt
                try:
                    from plugin_singer_spark.operators.stagecache import release_stage_caches
                    release_stage_caches(spark)
                except Exception:
                    pass
        sim.pair_cosine_kernel = arrow_kern
        print(json.dumps(row), flush=True)
        corpus.unpersist()
        queries.unpersist()


if __name__ == "__main__":
    main()
