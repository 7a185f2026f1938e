"""CDC-maintained MinHash index (operators/incremental_dedup.py): batch
equivalence, idempotent replay, update/delete maintenance."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from plugin_singer_spark.operators.dedup import minhash_lsh_pairs
from plugin_singer_spark.operators.incremental_dedup import EmbeddingIndex, MinHashIndex

PARAMS = dict(n=2, num_hashes=16, bands=8)


def _docs(spark, lo, hi):
    # deterministic corpus with planted near-dup structure: ids i and i+100
    # share a long common prefix (near-dups); others are distinct
    rows = []
    for i in range(lo, hi):
        base = i % 100
        words = [f"w{base}a{j}" for j in range(12)]
        if i >= 100:
            words[-1] = f"tail{i}"
        rows.append(Row(doc_id=i, text=" ".join(words)))
    return spark.createDataFrame(rows)


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_incremental_equals_batch(spark, tmp_path):
    """Folding any batch split through the index yields exactly the batch
    operator's candidate-pair set over the final corpus."""
    full = _docs(spark, 0, 150)
    expected = _pairs(minhash_lsh_pairs(full, "doc_id", verify=False, **PARAMS))
    assert expected  # planted dups must collide

    idx = MinHashIndex(spark, str(tmp_path / "idx"), **PARAMS)
    got = set()
    for lo, hi in [(0, 50), (50, 120), (120, 150)]:
        batch = _docs(spark, lo, hi)
        idx.update(batch, seq=lo)
        got |= _pairs(idx.candidates(batch))
    assert got == expected


def test_verified_pairs_equal_batch_verify(spark, tmp_path):
    full = _docs(spark, 0, 150)
    expected = _pairs(minhash_lsh_pairs(full, "doc_id", threshold=0.5, **PARAMS))
    idx = MinHashIndex(spark, str(tmp_path / "idx"), **PARAMS)
    got = set()
    for lo, hi in [(0, 80), (80, 150)]:
        batch = _docs(spark, lo, hi)
        idx.update(batch, seq=lo)
        got |= _pairs(idx.neardup_pairs(batch, corpus=full, threshold=0.5))
    assert got == expected


def test_replay_is_noop_and_update_rebands(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "idx"), **PARAMS)
    batch = _docs(spark, 0, 20)
    idx.update(batch, seq=1)
    rows1 = sorted(map(tuple, idx.read().collect()))
    assert len(rows1) == 20 * PARAMS["bands"]

    # same batch, same seq: LWW tie favors the target — index unchanged
    idx.update(batch, seq=1)
    assert sorted(map(tuple, idx.read().collect())) == rows1

    # doc 0 changes at a higher seq: its bands rows are REPLACED by key
    changed = spark.createDataFrame([Row(doc_id=0, text="completely different words here now")])
    idx.update(changed, seq=2)
    rows2 = idx.read()
    assert rows2.count() == 20 * PARAMS["bands"]  # still bands rows per doc
    old0 = {t for t in rows1 if t[0] == 0}
    new0 = {tuple(r) for r in rows2.filter(F.col("id") == 0).collect()}
    assert new0 != old0 and len(new0) == PARAMS["bands"]

    # stale replay of the ORIGINAL doc 0 at seq=1 must not resurrect it
    idx.update(batch.filter(F.col("doc_id") == 0), seq=1)
    assert {tuple(r) for r in idx.read().filter(F.col("id") == 0).collect()} == new0


def test_delete_tombstones_doc(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "idx"), **PARAMS)
    corpus = _docs(spark, 0, 120)
    idx.update(corpus, seq=1)
    probe = _docs(spark, 100, 101)  # near-dup of doc 0
    assert (0, 100) in _pairs(idx.candidates(probe))

    dele = spark.createDataFrame([(0, None, "D")], "doc_id long, text string, op string")
    idx.update(dele, id_col="doc_id", op_col="op", seq=2)
    assert idx.read().filter(F.col("id") == 0).count() == 0
    assert (0, 100) not in _pairs(idx.candidates(probe))


def test_compact_and_cow_mode_preserve_state(spark, tmp_path):
    """MOR deltas compact down to the same live rows; cow mode produces the
    identical index state per batch."""
    mor = MinHashIndex(spark, str(tmp_path / "mor"), **PARAMS)
    cow = MinHashIndex(spark, str(tmp_path / "cow"), **PARAMS)
    for lo, hi, seq in [(0, 60, 1), (60, 120, 2)]:
        batch = _docs(spark, lo, hi)
        mor.update(batch, seq=seq, mode="mor")
        cow.update(batch, seq=seq, mode="cow")
    before = sorted(map(tuple, mor.read().collect()))
    assert mor.table.snapshot().delta_files  # MOR actually deferred work
    mor.compact()
    assert not mor.table.snapshot().delta_files
    assert sorted(map(tuple, mor.read().collect())) == before
    assert sorted(map(tuple, cow.read().collect())) == before


DIM = 16
EPARAMS = dict(dim=DIM, planes=4, tables=4)


def _vecs(spark, lo, hi):
    # ids i and i+100 share a base direction with a small deterministic
    # perturbation (planted near-dups); others point elsewhere
    rows = []
    for i in range(lo, hi):
        base = i % 100
        v = [float((base * 7 + d * 3) % 11 - 5) for d in range(DIM)]
        if i >= 100:
            v[-1] += 0.25
        rows.append(Row(vec_id=i, embedding=v))
    return spark.createDataFrame(rows)


def test_embedding_index_equals_batch(spark, tmp_path):
    """Folding any split of a vector corpus through the EmbeddingIndex
    yields exactly the batch operator's verified pair set (same planes/
    tables/threshold — both bucket with the same deterministic
    hyperplanes)."""
    from plugin_singer_spark.operators.similarity import embedding_neardup_pairs

    full = _vecs(spark, 0, 150)
    expected = _pairs(
        embedding_neardup_pairs(
            full, dim=DIM, threshold=0.98, planes=EPARAMS["planes"],
            tables=EPARAMS["tables"], id_col="vec_id", vec_col="embedding",
            corpus_count=150,
        )
    )
    assert expected  # planted near-dups must collide

    idx = EmbeddingIndex(spark, str(tmp_path / "eidx"), **EPARAMS)
    got = set()
    for lo, hi in [(0, 70), (70, 150)]:
        batch = _vecs(spark, lo, hi)
        idx.update(batch, seq=lo)
        got |= _pairs(idx.neardup_pairs(batch, corpus=full, threshold=0.98))
    assert got == expected


def test_embedding_index_update_and_delete(spark, tmp_path):
    idx = EmbeddingIndex(spark, str(tmp_path / "eidx"), **EPARAMS)
    corpus = _vecs(spark, 0, 120)
    idx.update(corpus, seq=1)
    assert idx.read().count() == 120 * EPARAMS["tables"]
    probe = _vecs(spark, 100, 101)  # near-dup of vec 0
    assert (0, 100) in _pairs(idx.candidates(probe))

    dele = spark.createDataFrame([(0, None, "D")], "vec_id long, embedding array<double>, op string")
    idx.update(dele, op_col="op", seq=2)
    assert idx.read().filter(F.col("id") == 0).count() == 0
    assert (0, 100) not in _pairs(idx.candidates(probe))
    with pytest.raises(ValueError, match="was built with"):
        EmbeddingIndex(spark, str(tmp_path / "eidx"), dim=DIM, planes=6, tables=4)


# one op = (doc_id, version, is_delete); versions give LWW something to do
_ops_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 2), st.booleans()),
    min_size=1, max_size=18,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_ops_strategy, cuts=st.lists(st.integers(0, 17), max_size=2))
def test_index_converges_to_banding_of_lww_docs(spark, tmp_path_factory, ops, cuts):
    """Any CDC schedule — upserts, re-sends, deletes, arbitrary batch
    splits — leaves the index equal to the banding of the LWW-resolved
    surviving documents (the batch operator applied to the final corpus)."""
    from plugin_singer_spark.operators.dedup import banded_buckets

    def text_of(doc, ver):
        return " ".join(f"d{doc}v{ver}w{j}" for j in range(8))

    # oracle: fold ops in sequence order driver-side
    final: dict[int, tuple[int, str] | None] = {}
    for seq, (doc, ver, is_del) in enumerate(ops):
        final[doc] = None if is_del else (seq, text_of(doc, ver))

    idx = MinHashIndex(
        spark, str(tmp_path_factory.mktemp("conv") / "idx"), **PARAMS
    )
    bounds = sorted({0, *[min(c, len(ops)) for c in cuts], len(ops)})
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = ops[lo:hi]
        if not chunk:
            continue
        batch = spark.createDataFrame(
            [
                (doc, None if is_del else text_of(doc, ver), lo + k, "D" if is_del else "I")
                for k, (doc, ver, is_del) in enumerate(chunk)
            ],
            "doc_id long, text string, seq long, op string",
        )
        idx.update(batch, seq_col="seq", op_col="op")

    survivors = [(d, t) for d, v in final.items() if v is not None for _, t in [v]]
    got = sorted(map(tuple, idx.read().collect()))
    if not survivors:
        assert got == []
        return
    docs = spark.createDataFrame(survivors, "doc_id long, text string")
    expected = sorted(
        map(tuple, banded_buckets(docs, "doc_id", "text", **PARAMS).collect())
    )
    assert got == expected


def test_reopen_validates_params(spark, tmp_path):
    root = str(tmp_path / "idx")
    MinHashIndex(spark, root, **PARAMS)
    reopened = MinHashIndex(spark, root, **PARAMS)  # ok, params match
    assert reopened.bands == PARAMS["bands"]
    with pytest.raises(ValueError, match="was built with"):
        MinHashIndex(spark, root, n=5, num_hashes=16, bands=4)
