"""Similarity search over embedding columns (array<float>).

Two tiers, as the BASELINE brief requires:

- **Brute-force cosine top-k** — the correctness baseline. Cross join of
  queries × corpus with the query side broadcast (queries are small by
  construction), cosine as a zip_with/aggregate fold (JVM, codegen — no
  Python), then a per-query top-k window. Cost: |Q|×|C| — fine for |Q| in
  the thousands against millions of rows per executor; it is also the
  verify stage for the bucketed path.
- **LSH-bucketed ANN (random hyperplanes)** — the 100 TB path. ``p`` sign
  bits from deterministic pseudo-random hyperplanes → one bucket id per
  vector; candidates join only within buckets (multi-probe via bit flips
  for recall). Join key is a hash ⇒ balanced; cost linear + bucket-local.

The hyperplanes derive from the md5-based hash64 primitive so the whole
pipeline stays deterministic across runs/cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from plugin_singer_spark.operators.text import hash64


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i — sequential left-to-right fold in float64 (cast BEFORE the
    multiply: float32 products would round differently than the SQL oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cos_sim, rank).
    Ties broken by corpus id (deterministic)."""
    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane: int, table: int = 0) -> Column:
    """Deterministic pseudo-random hyperplane: component d ∈ [-1, 1) derived
    from md5('p:<table>:<plane>:<d>') — the same value the previous
    expression formulation computed via conv(substring(md5(..),1,15),16,10)
    % 2e6 / 1e6 - 1.

    Components are PRECOMPUTED on the driver and shipped as literals: they
    are constants, but Catalyst does not constant-fold md5 inside
    higher-order-function lambdas, so the expression version recomputed
    tables × planes × dim md5s PER ROW (~2000 md5s/vector — measured as the
    dominant cost of the whole LSH query). Identical on every executor,
    run, and cluster size."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"p:{table}:{plane}:{d}".encode()).hexdigest()
        comps.append(int(h[:15], 16) % 2_000_000 / 1_000_000.0 - 1.0)
    return F.array(*[F.lit(c) for c in comps])


def lsh_bucket(vec: Column, dim: int, planes: int = 8, table: int = 0) -> Column:
    """Sign-bit bucket id of a vector under ``planes`` hyperplanes."""
    bits = [
        F.when(dot(vec, _hyperplane(dim, p, table)) >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p)
        for p in range(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 6,
    tables: int = 8,
    multiprobe: int = 1,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k, multi-table LSH: ``tables`` independent hyperplane
    sets; candidates share the query's bucket in ANY table (plus
    ``multiprobe`` single-bit-flip neighbors per table), then exact cosine
    rank within candidates. Same output schema as :func:`brute_force_topk`;
    recall measured in tests. Candidate volume ≈ tables × (1+multiprobe) ×
    |corpus| / 2^planes per query — tune planes up as the corpus grows."""
    c_buckets = [
        lsh_bucket(F.col("_cv"), dim, planes, t) + F.lit(t * (2**planes)) for t in range(tables)
    ]
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("_cv")).withColumn(
        "bucket", F.explode(F.array(*c_buckets))
    )
    probes = []
    for t in range(tables):
        b0 = lsh_bucket(F.col("_qv"), dim, planes, t)
        probes.append(b0 + F.lit(t * (2**planes)))
        for i in range(min(multiprobe, planes)):
            probes.append(b0.bitwiseXOR(F.lit(2**i)) + F.lit(t * (2**planes)))
    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")).withColumn(
        "bucket", F.explode(F.array(*probes))
    )
    # dedup (query, candidate) BEFORE the cosine: a pair colliding in k
    # tables/probes would otherwise pay the dim-wide fold k times; the
    # dedup shuffle carries the vectors so no join-back is needed
    scored = (
        q.join(c, on="bucket")
        .dropDuplicates(["query_id", "vec_id"])
        .select("query_id", "vec_id", F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _centroid_sims(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<sim,idx>> of cosine similarity to each centroid literal."""
    return F.array(
        *[
            F.struct(
                (dot(vec, F.array(*[F.lit(float(x)) for x in c])) / (norm(vec) * F.lit(_l2(c)))).alias("sim"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def _l2(c: list[float]) -> float:
    return sum(x * x for x in c) ** 0.5 or 1.0


def ivf_centroids(
    corpus: DataFrame,
    dim: int,
    nlist: int = 16,
    iters: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: k-means by cosine with Lloyd
    iterations expressed as DataFrame jobs.

    Init = the ``nlist`` vectors with the smallest md5(vec_id) (seedless
    determinism — identical on every run/cluster size). Each iteration is
    one assign-and-average job: argmax-cosine assignment against centroid
    LITERALS (no join), then an element-wise ``avg`` per cluster. Only
    nlist×dim floats ever reach the driver."""
    v = corpus.select(F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("v"))
    init = (
        v.withColumn("_h", hash64(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(nlist)
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in init]
    for _ in range(iters):
        assigned = v.withColumn(
            "c", F.array_max(_centroid_sims(F.col("v"), cents))["idx"]
        )
        rows = (
            assigned.groupBy("c")
            .agg(*[F.avg(F.col("v")[i]).alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        new = {int(r["c"]): [float(r[f"d{i}"]) for i in range(dim)] for r in rows}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]  # empty cluster keeps its centroid
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k — the second scale family next to LSH: a
    coarse k-means quantizer partitions the corpus into ``nlist`` inverted
    lists; each query scans only its ``nprobe`` nearest lists. Cost per
    query ≈ nprobe/nlist of the corpus; the cluster id is the join key, so
    the candidate join is hash-balanced. Same output schema as
    :func:`brute_force_topk`; recall measured in tests."""
    cents = ivf_centroids(corpus, dim, nlist=nlist, iters=iters, corpus_id=corpus_id, corpus_vec=corpus_vec)
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("_cv")).withColumn(
        "cluster", F.array_max(_centroid_sims(F.col("_cv"), cents))["idx"]
    )
    probes = F.slice(
        F.reverse(F.array_sort(_centroid_sims(F.col("_qv"), cents))), 1, min(nprobe, nlist)
    )
    q = (
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv"))
        .withColumn("cluster", F.explode(F.transform(probes, lambda s: s["idx"])))
    )
    scored = (
        q.join(c, on="cluster")
        .dropDuplicates(["query_id", "vec_id"])
        .select("query_id", "vec_id", F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    planes: int = 6,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (a < b) by cosine ≥ threshold. ``exact=True``
    does the all-pairs join (verify/oracle path); default buckets by
    multi-table LSH first (generator path): a pair is a candidate when it
    collides in ANY of ``tables`` independent hyperplane sets, then exact
    cosine restores precision. Recall ≈ 1-(1-c^planes)^tables where c is
    the per-plane collision prob (1 - θ/π); more planes shrink buckets
    (cost), more tables recover recall — at 100 TB tune planes up with
    corpus size and keep tables fixed."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if exact:
        a, b = v.alias("a"), v.alias("b")
        pairs = a.crossJoin(b).filter(F.col("a.id") < F.col("b.id"))
    else:
        buckets = [
            lsh_bucket(F.col("v"), dim, planes, t) + F.lit(t * (2**planes)) for t in range(tables)
        ]
        vb = v.withColumn("bucket", F.explode(F.array(*buckets)))
        a, b = vb.alias("a"), vb.alias("b")
        # dedup candidate pairs BEFORE the cosine (a pair colliding in k
        # tables would pay the dim-wide fold k times); vectors ride the
        # dedup shuffle so no join-back is needed
        pairs = (
            a.join(b, on="bucket")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.v").alias("_va"),
                F.col("b.v").alias("_vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        return (
            pairs.select(
                "id_a", "id_b", F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim")
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
