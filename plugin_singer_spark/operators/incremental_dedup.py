"""CDC-maintained MinHash dedup index: near-dup detection as an
*incrementally maintained* lake table instead of a full-corpus recompute.

The batch operators (operators/dedup.py) re-shingle and re-band the whole
corpus per run — the right shape for a one-shot curation pass, the wrong
one for a living corpus fed by CDC: at 10^10 documents a nightly
recompute re-reads everything to find pairs involving the day's 10^6
changed docs. This module keeps the bare (id, band, bucket) banding rows
(operators/dedup.py:banded_buckets) in a :class:`LakeTable` keyed
(id, band), maintained by the SAME sequence-conditional LWW MERGE engine
as every other stream in the job (lake/merge.py — reference semantics
`AbstractPythonTarget.java`'s key-based upserts):

- an INSERT/UPDATE of a document re-bands just that document; the MERGE
  replaces its `bands` rows by key — stale buckets cannot linger;
- a DELETE tombstones all `bands` rows, so the doc stops matching without
  rewriting anything else;
- replays are no-ops (LWW ties favor the target), so the index inherits
  the pipeline's idempotent-epoch story — a crashed batch re-runs safely.

Per-batch cost is O(|batch| shingles) map-side + a bucket-equality join of
the batch's bare rows against the index — never a corpus scan. Candidates
then verify with the shared exact-Jaccard stage
(operators/dedup.py:jaccard_verify). Equivalence to the batch operator is
pytest-gated: folding any split of a corpus through the index yields
exactly minhash_lsh_pairs' pair set (tests/test_incremental_dedup.py).
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

_P_PREFIX = "minhash."


class MinHashIndex:
    """A MinHash banding index over a LakeTable at ``root``.

    Banding parameters are fixed at creation (stored in table properties
    and validated on reopen — rows banded under different parameters must
    never share a table: bucket ids would be incomparable)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        num_buckets: int = 16,
    ):
        self.spark = spark
        if LakeTable.exists(root):
            self.table = LakeTable(spark, root)
            props = self.table.snapshot().properties
            stored = {k[len(_P_PREFIX):]: int(v) for k, v in props.items() if k.startswith(_P_PREFIX)}
            mine = {"n": n, "num_hashes": num_hashes, "bands": bands}
            if stored and stored != mine:
                raise ValueError(
                    f"index at {root} was built with {stored}, reopened with {mine}"
                )
            self.n, self.num_hashes, self.bands = (
                stored.get("n", n), stored.get("num_hashes", num_hashes), stored.get("bands", bands)
            )
        else:
            self.n, self.num_hashes, self.bands = n, num_hashes, bands
            self.table = LakeTable.create(
                spark, root, _SCHEMA, key_columns=["id", "band"], num_buckets=num_buckets,
                properties={f"{_P_PREFIX}n": str(n), f"{_P_PREFIX}num_hashes": str(num_hashes),
                            f"{_P_PREFIX}bands": str(bands)},
            )

    def _banded(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        return banded_buckets(
            docs, id_col, text_col, n=self.n, num_hashes=self.num_hashes, bands=self.bands
        )

    def update(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        seq_col: str | None = None,
        op_col: str | None = None,
        seq: int = 0,
        mode: str = "mor",
    ):
        """Fold a CDC batch into the index. ``docs`` rows with
        ``op_col`` = 'D' delete the document (text may be null); all others
        upsert. Per-row sequence comes from ``seq_col`` or the constant
        ``seq`` — replaying a batch at the same seq is a no-op, re-sending
        a document at a higher seq replaces its buckets. Returns the
        committed snapshot (None for an empty batch).

        ``mode='mor'`` (default) appends per-bucket delta files — write
        cost O(|batch|·bands), the living-index posture; readers LWW-
        resolve and the standard ``table.compact()`` schedule folds deltas
        down (same knobs as every stream in the job). ``mode='cow'``
        rewrites touched buckets on write — for one-shot builds where read
        speed dominates. BENCH/INCREMENTAL_DEDUP.md records the gap: COW's
        per-batch cost tracks the TABLE (every bucket is touched once a
        batch spans the id space), MOR's tracks the batch."""
        ops = F.upper(F.col(op_col)) if op_col else F.lit("I")
        seqc = F.col(seq_col).cast("long") if seq_col else F.lit(seq).cast("long")
        meta = docs.select(
            F.col(id_col).alias("id"), seqc.alias("_seq"), ops.alias("_op")
        )
        live = docs.filter(ops != "D") if op_col else docs
        upserts = (
            self._banded(live, id_col, text_col)
            .join(meta, on="id")
            .select("id", "band", "bucket", "_seq", "_op")
        )
        src = upserts
        if op_col:
            # a delete must tombstone every (id, band) key — band fan-out is
            # static, no shingling of (possibly null) deleted text
            deletes = (
                meta.filter(F.col("_op") == "D")
                .select(
                    "id",
                    F.explode(F.sequence(F.lit(0), F.lit(self.bands - 1))).alias("band"),
                    F.lit(None).cast("string").alias("bucket"),
                    "_seq",
                    "_op",
                )
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

    def candidates(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
        """Distinct (id_a < id_b) candidate pairs touching this batch: the
        batch's bare banding rows bucket-join the index — O(|batch| + matched
        buckets), never a corpus scan. Call AFTER :meth:`update` so
        within-batch pairs surface (both docs are in the index; the pair
        normalization dedups the two orientations)."""
        nb = self._banded(docs, id_col, text_col).select(
            F.col("id").alias("_qid"), "band", "bucket"
        )
        pairs = (
            nb.join(self.read(), on=["band", "bucket"])
            .filter(F.col("_qid") != F.col("id"))
            .select(
                F.least("_qid", "id").alias("id_a"),
                F.greatest("_qid", "id").alias("id_b"),
            )
            .distinct()
        )
        return pairs

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
