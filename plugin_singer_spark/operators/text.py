"""Text analysis for training-data pipelines: tokenization, language ID,
quality scoring, token counting, document fingerprinting.

These are the engine-side additions a 100 TB corpus pipeline needs beyond
the reference's operator set (BASELINE brief). All hot paths are built-in
column expressions (whole-stage codegen, no Python); the shared 64-bit hash
primitive is ``bigint(md5(x)[0:15])`` which is reproducible in ANSI SQL —
every operator here has an exact DuckDB oracle.

Determinism note: md5 rather than xxhash64 because the oracle side must
compute the identical value; at cluster scale md5 costs ~2× xxhash64 but
both are vectorized JVM intrinsics — swap via ``HASH64`` if parity with the
oracle is not needed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# Small fixed stopword list — shared constant with the SQL oracles.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB:
    ``cast(concat('0x', substr(md5(x),1,15)) as bigint)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens (whitespace+punct split), empties
    dropped. Oracle: list_filter(regexp_split_to_array(lower(x), re), ...)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenizer regex (GPT-2 style, simplified to what both Spark
# and DuckDB regex engines support): contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs. Counting these units tracks
# real BPE token counts far better than whitespace words (punctuation and
# contractions split; long words still count 1 — a documented lower bound).
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_bpe(col: Column | str) -> Column:
    """Approximate BPE token count via the pre-tokenizer regex — one
    regexp_count expression, no Python. Exact DuckDB parity:
    ``len(regexp_extract_all(x, <same pattern>))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


def gram_array(t: Column, n: int) -> Column:
    """Word n-grams (with multiplicity, position order) from a token-array
    expression, built by zipping ``n`` shifted views of the array.

    The obvious ``transform(sequence(...), i -> concat_ws(slice(t, i+1, n)))``
    form re-evaluates the WHOLE token expression once per gram position —
    Catalyst inlines ``t`` into every lambda-bound slice, so a d-token doc
    re-tokenizes itself d times (measured 16× the tokenize cost at sf0.1).
    Zipping n shifted slices references ``t`` O(n) times total.

    Semantics (shared with every shingle oracle): size ≥ n → size-n+1 full
    grams; 0 < size < n → ONE partial gram of all tokens; size = 0 → empty
    array (ADVICE r3 — no degenerate '' gram)."""
    L = F.greatest(F.size(t) - (n - 1), F.lit(0))
    g = F.slice(t, 1, L)
    for k in range(1, n):
        g = F.zip_with(g, F.slice(t, k + 1, L), lambda a, b: F.concat(a, F.lit(" "), b))
    return (
        F.when(F.size(t) >= n, g)
        .when(F.size(t) > 0, F.array(F.concat_ws(" ", t)))
        .otherwise(F.array().cast("array<string>"))
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams — the dedup shingling unit. Built from the
    token array with shifted zip_with views (no UDF, no per-position
    re-tokenization — see :func:`gram_array`). Zero-token documents yield
    an EMPTY array (not a single empty-string gram) so empty docs never
    collide with each other through a degenerate '' shingle — and so the
    Spark side matches the DuckDB oracle's shingle CTE, which filters
    ``len(toks) > 0`` (ADVICE r3)."""
    return F.array_distinct(gram_array(tokens(col), n))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition features + a composite
    quality score in [0,1] (Gopher/C4-style heuristics, simplified and
    fully declarative)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    n_uniq = F.size(F.array_distinct(toks))

    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n_tok > 0, n_uniq / n_tok).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_tok > 0, F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)) / n_tok
    ).otherwise(F.lit(0.0))

    # composite: in-range length, some stopwords, diverse vocabulary
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(uniq_ratio >= 0.3, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        uniq_ratio.alias("unique_token_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: English stopword density + ASCII-alpha ratio.
    (Real pipelines plug fastText here; the heuristic keeps the operator
    self-contained and oracle-checkable.) Adds ``lang_pred`` + ``lang_conf``."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_chars = F.length(t)
    ascii_alpha = F.length(F.regexp_replace(t, "[^A-Za-z ]", ""))
    ascii_ratio = F.when(n_chars > 0, ascii_alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    pred = (
        F.when((stop_ratio >= 0.03) & (ascii_ratio >= 0.6), F.lit("en"))
        .when(ascii_ratio >= 0.6, F.lit("latin-other"))
        .otherwise(F.lit("non-latin"))
    )
    conf = F.round(F.least(F.lit(1.0), stop_ratio * 2 + ascii_ratio * 0.5), 4)
    return df.select("*", pred.alias("lang_pred"), conf.alias("lang_conf"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document — keyword extraction / doc
    summarization for corpus QA. ``score = tf * (ln((N+1)/(df+1)) + 1)``
    (smoothed idf, sklearn convention).

    Plan shape at 100 TB: explode → per-(doc, term) count (partial agg
    map-side) → term df (one agg over the term-counts table, NOT another
    corpus scan) → broadcast-size scalar N → per-doc top-k window. The
    per-term df table is vocabulary-sized (≪ corpus); the window
    partitions by doc so no single task sees more than one doc's terms."""
    from pyspark.sql.window import Window

    terms = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term"))
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(dfreq, "term").select(
        "id", "term", "tf", F.round(F.col("tf") * idf, 6).alias("tfidf")
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "tfidf", "rank")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 — the lexical
    retrieval twin of the embedding ANN path (operators/similarity.py).

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avglen))`` with
    the Robertson-Sparck-Jones idf ``ln(1 + (N-df+0.5)/(df+0.5))``.

    Scale: the query term set is tiny → the per-term df lookup and the
    per-doc score reduce to one corpus scan with a vocabulary-sized
    semi-join (broadcast); global N and avg doc length are two scalars.
    Deterministic ties (score desc, id asc) so results are reproducible."""
    from pyspark.sql.window import Window

    qset = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    ).select("id", "toks", F.size("toks").alias("dl"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"] or 0.0)

    # per-doc tf for query terms only (array filter — no explode shuffle).
    # NB: a two-arg lambda would make Spark bind the second param to the
    # ELEMENT INDEX, so the term must be captured via a closure factory.
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("toks"), _eq(t))).alias(f"tf_{i}") for i, t in enumerate(qset)
    ]
    per_doc = toks.select("id", "dl", *tf_cols)
    # per-term document frequency: one aggregate over the same table
    dfreqs = per_doc.agg(
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}") for i in range(len(qset))]
    ).collect()[0]
    score = F.lit(0.0)
    for i in range(len(qset)):
        dfi = float(dfreqs[f"df_{i}"] or 0)
        idf = math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5))
        tf = F.col(f"tf_{i}").cast("double")
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl or 1.0))
        score = score + F.lit(idf) * tf * (k1 + 1.0) / denom
    scored = per_doc.select("id", F.round(score, 6).alias("bm25")).filter(F.col("bm25") > 0)
    # global top-k via TakeOrderedAndProject (orderBy+limit — per-partition
    # top-k then a k-row driver merge, never a 1-partition global sort);
    # ranks are assigned over the k-row result only
    topk = scored.orderBy(F.col("bm25").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col("id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias(id_col), "bm25", "rank"
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: ``fp_sha256`` over whitespace-normalized text
    (exact-dup key) and ``fp_min_shingle`` — the minimum 64-bit shingle hash
    (a 1-permutation MinHash, stable under small reorderings)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    sh = word_shingles(text_col, 3)
    minh = F.array_min(F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")))
    return df.select(
        "*",
        F.sha2(norm, 256).alias("fp_sha256"),
        minh.alias("fp_min_shingle"),
    )
