"""CDC-maintained dedup indexes: near-dup detection as *incrementally
maintained* lake tables instead of full-corpus recomputes.

The batch operators (operators/dedup.py, operators/similarity.py)
re-shingle / re-bucket the whole corpus per run — the right shape for a
one-shot curation pass, the wrong one for a living corpus fed by CDC: at
10^10 documents a nightly recompute re-reads everything to find pairs
involving the day's 10^6 changed docs. This module keeps the bare
(id, band, bucket) banding rows in a :class:`LakeTable` keyed (id, band),
maintained by the SAME sequence-conditional LWW MERGE engine as every
other stream in the job (lake/merge.py — reference semantics
`AbstractPythonTarget.java`'s key-based upserts):

- an INSERT/UPDATE re-bands just that document/vector; the MERGE replaces
  its rows by key — stale buckets cannot linger;
- a DELETE tombstones all its band rows, so it stops matching without
  rewriting anything else;
- replays are no-ops (LWW ties favor the target), so the index inherits
  the pipeline's idempotent-epoch story — a crashed batch re-runs safely.

Per-batch cost is O(|batch|) banding map-side + a bucket-equality join of
the batch's bare rows against the index — never a corpus re-shingle /
re-hash. Two concrete indexes share the machinery:

- :class:`MinHashIndex` — MinHash band buckets over text; candidates
  verify with the shared exact-Jaccard stage (operators/dedup.py).
- :class:`EmbeddingIndex` — multi-table hyperplane-LSH buckets over
  embedding vectors; candidates verify by exact cosine with the
  dedup-then-gather shape (operators/similarity.py's measured optimum).

Equivalence to the batch operators is pytest-gated: folding any split of
a corpus through an index yields exactly the batch operator's pair set
(tests/test_incremental_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from plugin_singer_spark.lake.merge import merge_append, merge_into
from plugin_singer_spark.lake.table import LakeTable
from plugin_singer_spark.operators.dedup import banded_buckets, jaccard_verify, shingle_table

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
    ]
)


class _BandedLakeIndex:
    """Shared machinery: a LakeTable of bare (id, band, bucket) rows keyed
    (id, band), CDC-maintained. Subclasses define the banding function and
    their parameter set; parameters are fixed at creation (stored in table
    properties and validated on reopen — rows banded under different
    parameters must never share a table: bucket ids would be
    incomparable)."""

    _PROP_PREFIX: str = "index."
    _ID_COL: str = "id"
    _VALUE_COL: str = "value"

    def __init__(self, spark: SparkSession, root: str, params: dict[str, int], num_buckets: int):
        self.spark = spark
        pfx = self._PROP_PREFIX
        if LakeTable.exists(root):
            self.table = LakeTable(spark, root)
            props = self.table.snapshot().properties
            stored = {k[len(pfx):]: int(v) for k, v in props.items() if k.startswith(pfx)}
            if stored and stored != params:
                raise ValueError(f"index at {root} was built with {stored}, reopened with {params}")
            self.params = stored or dict(params)
        else:
            self.params = dict(params)
            self.table = LakeTable.create(
                spark, root, _SCHEMA, key_columns=["id", "band"], num_buckets=num_buckets,
                properties={f"{pfx}{k}": str(v) for k, v in params.items()},
            )

    # ---- subclass contract -------------------------------------------------
    def _banded(self, docs: DataFrame, id_col: str, value_col: str) -> DataFrame:
        """(id, band, bucket) bare rows for a batch."""
        raise NotImplementedError

    @property
    def _num_bands(self) -> int:
        """Static per-id band fan-out (for delete tombstones)."""
        raise NotImplementedError

    # ---- maintenance -------------------------------------------------------
    def update(
        self,
        docs: DataFrame,
        id_col: str | None = None,
        value_col: str | None = None,
        seq_col: str | None = None,
        op_col: str | None = None,
        seq: int = 0,
        mode: str = "mor",
    ):
        """Fold a CDC batch into the index. ``docs`` rows with
        ``op_col`` = 'D' delete (the value may be null); all others upsert.
        Per-row sequence comes from ``seq_col`` or the constant ``seq`` —
        replaying a batch at the same seq is a no-op, re-sending an id at a
        higher seq replaces its buckets. Returns the committed snapshot
        (None for an empty batch).

        ``mode='mor'`` (default) appends per-bucket delta files — write
        cost O(|batch|·bands), the living-index posture; readers LWW-
        resolve and the standard :meth:`compact` schedule folds deltas
        down (same knobs as every stream in the job). ``mode='cow'``
        rewrites touched buckets on write — for one-shot builds where read
        speed dominates. BENCH/INCREMENTAL_DEDUP.md records the gap: COW's
        per-batch cost tracks the TABLE (every bucket is touched once a
        batch spans the id space), MOR's tracks the batch."""
        id_col = id_col or self._ID_COL
        value_col = value_col or self._VALUE_COL
        ops = F.upper(F.col(op_col)) if op_col else F.lit("I")
        seqc = F.col(seq_col).cast("long") if seq_col else F.lit(seq).cast("long")
        # in-batch LWW per id FIRST (engine primitive — map-side partial
        # max_by): a batch carrying two versions of one doc must band only
        # the surviving version. Banding rows then join meta 1:1 by id —
        # without the pre-resolve that join cross-products versions×seqs
        # and stale-version buckets could ride the newer seq into the MERGE.
        from plugin_singer_spark.lake.merge import lww_dedup

        docs = lww_dedup(
            docs.withColumn("_seq", seqc).withColumn("_op", ops), [id_col], seq_col="_seq"
        )
        meta = docs.select(F.col(id_col).alias("id"), "_seq", "_op")
        live = docs.filter(F.col("_op") != "D") if op_col else docs
        upserts = (
            self._banded(live, id_col, value_col)
            .join(meta, on="id")
            .select("id", "band", "bucket", "_seq", "_op")
        )
        src = upserts
        if op_col:
            # a delete must tombstone every (id, band) key — band fan-out is
            # static, no banding of (possibly null) deleted values
            deletes = meta.filter(F.col("_op") == "D").select(
                "id",
                F.explode(F.sequence(F.lit(0), F.lit(self._num_bands - 1))).alias("band"),
                F.lit(None).cast("string").alias("bucket"),
                "_seq",
                "_op",
            )
            src = upserts.unionByName(deletes)
        do_merge = merge_append if mode == "mor" else merge_into
        return do_merge(self.table, src, seq_col="_seq", op_col="_op")

    def compact(self, **kwargs):
        """Fold accumulated MOR deltas into the base (lake/merge.py:compact
        — same size-adaptive/staggered knobs as every other table)."""
        from plugin_singer_spark.lake.merge import compact

        return compact(self.table, **kwargs)

    def read(self) -> DataFrame:
        """Live (id, band, bucket) rows (tombstones filtered by the lake read)."""
        return self.table.read(columns=["id", "band", "bucket"]).select("id", "band", "bucket")

    def candidates(self, docs: DataFrame, id_col: str | None = None, value_col: str | None = None) -> DataFrame:
        """Distinct (id_a < id_b) candidate pairs touching this batch: the
        batch's bare banding rows bucket-join the index — O(|batch| + matched
        buckets), never a corpus re-hash. Call AFTER :meth:`update` so
        within-batch pairs surface (both sides are in the index; the pair
        normalization dedups the two orientations)."""
        nb = self._banded(docs, id_col or self._ID_COL, value_col or self._VALUE_COL).select(
            F.col("id").alias("_qid"), "band", "bucket"
        )
        return (
            nb.join(self.read(), on=["band", "bucket"])
            .filter(F.col("_qid") != F.col("id"))
            .select(
                F.least("_qid", "id").alias("id_a"),
                F.greatest("_qid", "id").alias("id_b"),
            )
            .distinct()
        )


class MinHashIndex(_BandedLakeIndex):
    """MinHash banding index over text documents (reference batch twin:
    operators/dedup.py:minhash_lsh_pairs)."""

    _PROP_PREFIX = "minhash."
    _ID_COL = "doc_id"
    _VALUE_COL = "text"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        num_buckets: int = 16,
    ):
        super().__init__(
            spark, root, {"n": n, "num_hashes": num_hashes, "bands": bands}, num_buckets
        )
        self.n, self.num_hashes, self.bands = (
            self.params["n"], self.params["num_hashes"], self.params["bands"]
        )

    @property
    def _num_bands(self) -> int:
        return self.bands

    def _banded(self, docs: DataFrame, id_col: str, value_col: str) -> DataFrame:
        return banded_buckets(
            docs, id_col, value_col, n=self.n, num_hashes=self.num_hashes, bands=self.bands
        )

    def neardup_pairs(
        self,
        docs: DataFrame,
        corpus: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.8,
        max_doc_freq: int | None = None,
    ) -> DataFrame:
        """Exact-Jaccard-verified near-dup pairs touching this batch:
        :meth:`candidates` then the shared verify stage over shingles
        gathered from ``corpus`` (which must contain every live document —
        the lake documents table in a full pipeline)."""
        cand = self.candidates(docs, id_col, text_col)
        sh = shingle_table(corpus, id_col, text_col, self.n)
        return jaccard_verify(cand, sh, threshold, max_doc_freq)


class EmbeddingIndex(_BandedLakeIndex):
    """Multi-table hyperplane-LSH index over embedding vectors (batch twin:
    operators/similarity.py:embedding_neardup_pairs). ``band`` is the LSH
    table index — with no corpus-side multiprobe, posexplode position ==
    table, so (id, band) is a stable upsert key and a delete fans out to
    exactly ``tables`` tombstones. Parameters (dim/planes/tables) are fixed
    at creation: growing the corpus past the planes' design point means
    REBUILDING under new parameters (bucket ids are not comparable across
    plane counts), the same contract as any LSH index service."""

    _PROP_PREFIX = "emblsh."
    _ID_COL = "vec_id"
    _VALUE_COL = "embedding"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        dim: int,
        planes: int = 8,
        tables: int = 8,
        num_buckets: int = 16,
    ):
        super().__init__(
            spark, root, {"dim": dim, "planes": planes, "tables": tables}, num_buckets
        )
        self.dim, self.planes, self.tables = (
            self.params["dim"], self.params["planes"], self.params["tables"]
        )

    @property
    def _num_bands(self) -> int:
        return self.tables

    def _banded(self, docs: DataFrame, id_col: str, value_col: str) -> DataFrame:
        from plugin_singer_spark.operators.similarity import lsh_bucket_col

        v = docs.select(F.col(id_col).alias("id"), F.col(value_col).alias("_v"))
        # bucket longs carry the table offset (t·2^planes) baked in; cast to
        # string for the shared index schema — equality is preserved. With
        # no corpus-side multiprobe, posexplode position == table index.
        return v.select(
            "id",
            F.posexplode(
                lsh_bucket_col(v, "_v", self.dim, self.planes, self.tables)
            ).alias("band", "bucket"),
        ).withColumn("bucket", F.col("bucket").cast("string"))

    def neardup_pairs(
        self,
        docs: DataFrame,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.95,
    ) -> DataFrame:
        """Exact-cosine-verified near-dup pairs touching this batch:
        :meth:`candidates`, then gather each side's vector+norm from
        ``corpus`` by id-join and score each unique pair once — the
        dedup-then-gather shape measured optimal for the batch operator
        (BENCH/COSINE_KERNEL_AB.md)."""
        from plugin_singer_spark.operators.similarity import dot, norm

        cand = self.candidates(docs, id_col, vec_col)
        base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
            "_n", norm(F.col("v"))
        )
        va = base.select(F.col("id").alias("id_a"), F.col("v").alias("_va"), F.col("_n").alias("_na"))
        vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("_vb"), F.col("_n").alias("_nb"))
        return (
            cand.join(va, on="id_a")
            .join(vb, on="id_b")
            .select(
                "id_a",
                "id_b",
                F.round(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
