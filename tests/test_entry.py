"""Driver-contract smoke: entry() runs, every queries() entry returns rows
at sf0.001, every oracle key exists in queries()."""

import __spark_entry__ as entry


def test_entry_flagship(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"repo", "path", "commit", "lang", "content"}


def test_oracle_keys_subset():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_).issubset(set(qs))
    # the non-oracle entries are exactly the documented probabilistic/Arrow ops
    assert set(qs) - set(os_) == {
        "minhash_lsh_pairs",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "embedding_neardup_lsh",
        "dedup_clusters_lsh",  # LSH candidate graph — exact-pair variant is the oracle
        "incremental_neardup",  # index maintains banding candidates — batch-equivalence pytest is the gate
        "incremental_embedding_neardup",  # same gate, embedding modality
    }


def test_all_queries_execute(spark):
    for name, fn in entry.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        n = df.count()
        assert n >= 0, name
