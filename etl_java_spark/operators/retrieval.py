"""Retrieval / search operators: BM25 ranking, TF-IDF term extraction,
and fixed-size overlapping text chunking (RAG document prep).

Charter §2B extensions (no reference counterpart — RoberWaters/ETL-Java,
src/etl/ETLProcess.java:1-568, is a JDBC console ETL with no text
processing). These are the retrieval-side primitives of an LLM data
platform: score corpus documents against a query, surface the most
distinguishing terms per document, and split long documents into
overlapping windows for embedding/indexing.

Scale stance:
- Tokenisation and term statistics are pure Column expressions (explode +
  groupBy count): one shuffle for per-(doc, term) frequencies, one
  map-side-combinable shuffle for document frequencies. No Python UDFs.
- Corpus-level scalars (N docs, average doc length) are a 1-row aggregate
  cross-joined back in — Spark plans that as a broadcast nested loop with
  a single-row build side, i.e. free.
- Query terms are a literal array (broadcast by value). The corpus text
  column itself is never shuffled — only (id, term, tf) triples, and only
  for terms that survive the semi join against the query.
- Chunking is sequence+explode+substring: output size is O(total chars /
  stride) rows regardless of document count, embarrassingly parallel,
  no shuffle at all.

Determinism: every ranking ties-breaks on integer/string columns and all
float scores are rounded before comparison/output, so results are
bitwise-reproducible across engines and partitionings (DuckDB-oracle
checkable — see queries q119-q121).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ASCII fixture text; identical regex semantics in DuckDB's
# STRING_SPLIT_REGEX and Spark's split().
ASCII_TOKEN_PATTERN = "[^a-z0-9]+"


def doc_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = ASCII_TOKEN_PATTERN,
) -> DataFrame:
    """Explode documents to (id, term, tf) term-frequency triples.

    One shuffle (groupBy (id, term)); the count is map-side combinable so
    the shuffle carries partial counts, not raw token instances.
    """
    tok = F.explode(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), pattern),
            lambda x: x != F.lit(""),
        )
    ).alias("term")
    return (
        docs.select(F.col(id_col), tok)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    pattern: str = ASCII_TOKEN_PATTERN,
) -> DataFrame:
    """Rank documents against ``query_terms`` with BM25 (Robertson/
    Sparck-Jones idf, Lucene's +1 floor so idf stays positive).

    Plan: tokenize once, carry doc length through the tf aggregation (no
    separate doc-length join — at corpus scale a per-doc side table is
    itself 100 TB-adjacent) -> filter to query terms via an ``isin``
    literal (map-side, no join) -> df per term (|q| rows, map-side
    combinable, broadcast back) + 1-row corpus stats -> per-doc score sum
    (1 shuffle on id) -> global top-k (TakeOrderedAndProject, no sort).

    At 100 TB the only data that moves is (doc, query-term, tf, dl) for
    docs actually containing a query term — the corpus text never
    shuffles.

    Determinism: doc lengths are integers (exact in double at any
    summation order, so avgdl is reproducible); per-doc contributions go
    through an exact decimal sum; scores are ROUND(..,9)ed and ties break
    on id. The only transcendental is ln over |q| distinct df values,
    verified bitwise-equal between JVM and libm in tests.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), pattern),
        lambda x: x != F.lit(""),
    )
    tokenized = docs.select(
        F.col(id_col), toks.alias("toks"), F.size(toks).cast("double").alias("dl")
    )
    tf = (
        tokenized.select(id_col, "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    # corpus stats: 1 row, broadcast-joined (free at any scale)
    stats = tokenized.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # per-term document frequency over the filtered triples (|q| rows)
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_d = F.col("tf").cast("double")
    denom = tf_d + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * tf_d * (k1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(contrib.cast("decimal(38,18)")).cast("double"), 9
            ).alias("bm25")
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(topk)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = ASCII_TOKEN_PATTERN,
) -> DataFrame:
    """Top-``k`` most distinguishing terms per document.

    Rank is (tf DESC, df ASC, term ASC) — pure integer/string ordering,
    exactly the ordering tf·idf induces when comparing terms with equal
    tf, but with no float boundary to flip between engines. The tf-idf
    value itself (tf · ln(N/df), rounded) is emitted as a column.

    Plan: tf triples (1 shuffle) -> df per term (map-side combinable
    shuffle; at web scale the term table is vocab-sized, so it joins
    back on the term key as a plain equi-join — AQE broadcasts it when
    it fits, shuffles it when it doesn't — and a min-df floor prunes the
    Zipf tail) -> per-doc window top-k.
    """
    tf = doc_terms(docs, text_col, id_col, pattern)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                9,
            ).alias("tfidf"),
            F.col("rk").alias("rank"),
        )
    )


def chunk_chars(
    docs: DataFrame,
    size: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the standard RAG indexing prep (chunk -> embed -> index).

    Chunks start at 1, 1+stride, 1+2·stride, ... (stride = size-overlap);
    every chunk is ``substring(text, start, size)`` so the final chunk is
    naturally short. Emits (id, chunk_id, chunk_start, chunk_len, chunk).

    Plan: sequence+explode+substring — pure Column expressions, no
    shuffle, no UDF; output rows ∝ total corpus chars / stride. At 100 TB
    this is a map-only pass that parallelises with the input splits.
    (Token-aware chunking = run this on the output of a tokenizer's
    offset column instead of raw chars; the plumbing is identical.)
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    starts = F.sequence(
        F.lit(1),
        # last window start: covers the final partial chunk
        F.greatest(F.length(F.col(text_col)) - overlap, F.lit(1)),
        F.lit(stride),
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.col("chunk_start"),
            F.substring(F.col(text_col), F.col("chunk_start"), size).alias("chunk"),
        )
        .withColumn("chunk_len", F.length(F.col("chunk")))
        .select(id_col, "chunk_id", "chunk_start", "chunk_len", "chunk")
    )


def prefix_index(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 4,
    topk: int = 3,
    pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Autocomplete/search prefix index: for every token prefix of
    length ``min_len..max_len``, the ``topk`` completions by corpus
    frequency — the build step behind type-ahead and query-suggestion
    services, expressed as two bounded shuffles.

    Plan: one token-frequency count (map-side combinable) over the
    corpus; prefixes explode from the DISTINCT token table (vocab-
    sized, not corpus-sized — at most max_len-min_len+1 rows per term);
    the per-prefix top-k is a window capped at ``topk`` with
    deterministic (count desc, token asc) order. Returns
    (prefix, token, total, rank).
    """
    from ..functions.lm import token_array
    from pyspark.sql import Window

    toks = docs.select(F.explode(token_array(text_col, pattern)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("total"))
    lens = F.sequence(
        F.lit(min_len), F.least(F.lit(max_len), F.length("tok"))
    )
    prefixed = (
        freq.filter(F.length("tok") >= min_len)
        .withColumn("__len", F.explode(lens))
        .select(
            F.expr("substring(tok, 1, __len)").alias("prefix"),
            F.col("tok").alias("token"),
            "total",
        )
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("total").desc(), F.col("token").asc()
    )
    return (
        prefixed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Feature hashing (the "hashing trick"): map every token into one
    of ``dim`` buckets by md5 and count — fixed-width sparse text
    featurization with NO vocabulary build, the property that matters
    at corpus scale (a vocab dictionary needs a global build + broadcast
    and grows with the data; a hash is stateless and map-only).

    Returns one row per document: (id, features, nnz, l1) where
    ``features`` is the sparse vector as a bucket-sorted
    array<struct<bucket,cnt>>. The md5 bucket arithmetic is the same
    engine-replayable form as the CMS sketch rows.
    """
    from ..functions.lm import token_array

    toks = docs.select(
        F.col(id_col), F.explode(token_array(text_col, pattern)).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long") % dim
    ).cast("int")
    counts = toks.groupBy(id_col, bucket.alias("bucket")).agg(
        F.count("*").alias("cnt")
    )
    return counts.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("bucket", "cnt"))).alias(
            "features"
        ),
        F.count("*").cast("long").alias("nnz"),
        F.sum("cnt").alias("l1"),
    )


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel_id",
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval-quality metrics for a single-relevant-doc
    ground truth: rank_of_relevant (NULL if outside top-k), reciprocal
    rank, and NDCG@k (with one relevant doc, DCG = 1/log2(rank+1) and
    IDCG = 1, so NDCG == that gain). The eval-harness step of a
    retrieval pipeline: rank with BM25/ANN (q119/q53), score here.

    One broadcastable join of the (tiny) truth table onto the ranked
    lists and a per-query aggregate. log2 is the one
    not-correctly-rounded libm call, so the metrics are rounded to 12
    decimals — the q85 discipline for cross-engine bit-stability.
    """
    hits = ranked.filter(F.col(rank_col) <= k).join(
        F.broadcast(relevant),
        (ranked[query_col] == relevant[query_col])
        & (ranked[doc_col] == relevant[rel_col]),
        "inner",
    ).select(ranked[query_col].alias("__q"), F.col(rank_col).alias("__r"))
    qs = relevant.select(F.col(query_col).alias("__q")).distinct()
    out = qs.join(hits, "__q", "left")
    rr = F.when(
        F.col("__r").isNotNull(), 1.0 / F.col("__r").cast("double")
    ).otherwise(F.lit(0.0))
    ndcg = F.when(
        F.col("__r").isNotNull(),
        1.0 / F.log2(F.col("__r").cast("double") + 1.0),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("__q").alias(query_col),
        F.col("__r").cast("int").alias("rank_of_relevant"),
        F.round(rr, 12).alias("reciprocal_rank"),
        F.round(ndcg, 12).alias(f"ndcg_at_{k}"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int = 5,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings:
    score(d) = 1/(k + rank_a(d)) + 1/(k + rank_b(d)), the standard
    zero-training way to combine lexical and vector retrieval (k=60
    per Cormack et al.). Documents missing from one list contribute 0
    from that side — the top-K truncation semantics every production
    fuser uses.

    Exactly two rankers by design: the fused score is then ONE fixed
    double expression over a full-outer join (bit-reproducible), not a
    float SUM whose addend order depends on partitioning. (For n
    rankers, chain joins — the expression stays fixed-order.) The join
    keys on (query, doc): per-query candidate lists are top-K bounded,
    so the shuffle is K-bounded per query regardless of corpus size.

    Returns (query_id, neighbor_id, fused_score, fused_rank) for the
    ``top`` fused docs per query; ties break toward the smaller doc id.
    """
    a = ranked_a.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__d"),
        F.col(rank_col).alias("__ra"),
    )
    b = ranked_b.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__d"),
        F.col(rank_col).alias("__rb"),
    )
    j = a.join(b, ["__q", "__d"], "full_outer")
    score = F.when(
        F.col("__ra").isNotNull(),
        F.lit(1.0) / (F.lit(float(k)) + F.col("__ra").cast("double")),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("__rb").isNotNull(),
        F.lit(1.0) / (F.lit(float(k)) + F.col("__rb").cast("double")),
    ).otherwise(F.lit(0.0))
    scored = j.select(
        F.col("__q").alias(query_col),
        F.col("__d").alias(id_col),
        score.alias("fused_score"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("fused_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top)
        .select(
            query_col,
            id_col,
            F.round("fused_score", 12).alias("fused_score"),
            "fused_rank",
        )
    )


def rbo_overlap(
    rank_a: DataFrame,
    rank_b: DataFrame,
    query_col: str,
    item_col: str,
    rank_col: str,
    k: int = 10,
) -> DataFrame:
    """Rank-biased overlap at depth ``k`` with persistence p = 1/2 —
    the top-weighted agreement score between two rankings of the same
    candidate set (complements MRR/NDCG, which need relevance labels;
    RBO needs only the two rankings):

        RBO@k = sum_{d=1..k} p^(d-1) * |A_1..d ∩ B_1..d| / d
                / sum_{d=1..k} p^(d-1)

    p = 1/2 is chosen deliberately: every weight is an exact binary
    fraction, so the per-depth terms are single correctly-rounded
    doubles and the sum runs through decimals (order-independent) —
    bit-reproducible, SQL-replayable (the q277 no-float-SUM
    discipline).

    Relational shape: inner-join the two top-k lists per (query, item)
    -> each shared item enters the overlap at depth max(rank_a,
    rank_b); explode the k depths (bounded) and count. One equi-join +
    one k-bounded aggregate per query.

    Returns (query, rbo) for EVERY query appearing in either ranking:
    a query whose two lists share no items scores rbo = 0.0 (left-join
    onto the distinct query set) instead of silently vanishing —
    dropping them would overstate average agreement.
    """
    a = rank_a.select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(rank_col).alias("__ra"),
    ).filter(F.col("__ra") <= k)
    b = rank_b.select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(rank_col).alias("__rb"),
    ).filter(F.col("__rb") <= k)
    shared = a.join(b, on=["__q", "__i"]).select(
        "__q", F.greatest("__ra", "__rb").alias("__entry")
    )
    depths = shared.select(
        "__q",
        F.explode(F.sequence(F.col("__entry"), F.lit(k))).alias("__d"),
    )
    per_depth = depths.groupBy("__q", "__d").agg(
        F.count("*").cast("long").alias("__x")
    )
    weights = [0.5 ** (d - 1) for d in range(1, k + 1)]
    denom = sum(weights)
    w_expr = F.lit(weights[0])
    for d in range(2, k + 1):
        w_expr = F.when(F.col("__d") == d, weights[d - 1]).otherwise(w_expr)
    term = (
        w_expr * F.col("__x").cast("double") / F.col("__d").cast("double")
    ).cast("decimal(38,15)")
    scored = per_depth.groupBy("__q").agg(
        F.round(F.sum(term).cast("double") / F.lit(denom), 12).alias("rbo")
    )
    all_q = a.select("__q").unionByName(b.select("__q")).distinct()
    return all_q.join(scored, on="__q", how="left").select(
        F.col("__q").alias(query_col),
        F.coalesce(F.col("rbo"), F.lit(0.0)).alias("rbo"),
    )


def beyond_accuracy(
    topk: DataFrame,
    vectors: DataFrame,
    catalog_n_df: DataFrame,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Beyond-accuracy recommender metrics over a top-k table:

    - catalog coverage@k — what fraction of the catalog ever gets
      recommended (a recommender that only surfaces 2% of items is a
      popularity echo chamber however good its precision);
    - intra-list diversity (ILD) — the mean pairwise cosine DISTANCE
      inside each query's list, averaged over queries (lists of
      near-clones score low however relevant they are).

    ``catalog_n_df`` is a 1-row (catalog_n) aggregate (broadcast).
    Pairwise work is k^2 per query — bounded by the list, never the
    catalog. Per-pair cosines fold in index order (q260 discipline);
    pair terms and per-query means pass through decimals so no float
    SUM depends on ordering. Returns one row: (n_queries, catalog_n,
    n_recommended, coverage_at_k, ild_mean).
    """
    from ..functions.vectors import cosine

    lists = topk.select(
        F.col(query_col).alias("__q"), F.col(item_col).alias("__i")
    )
    v = vectors.select(
        F.col(vec_id_col).alias("__i"), F.col(vec_col).alias("__v")
    )
    with_vec = lists.join(v, on="__i")
    a = with_vec.select("__q", F.col("__i").alias("__ia"), F.col("__v").alias("__va"))
    b = with_vec.select("__q", F.col("__i").alias("__ib"), F.col("__v").alias("__vb"))
    pairs = a.join(b, on="__q").filter(F.col("__ia") < F.col("__ib"))
    per_q = pairs.select(
        "__q",
        (F.lit(1.0) - cosine(F.col("__va"), F.col("__vb")))
        .cast("decimal(38,15)")
        .alias("__d"),
    ).groupBy("__q").agg(
        (F.sum("__d").cast("double") / F.count("*").cast("double"))
        .cast("decimal(38,15)")
        .alias("__ild")
    )
    ild = per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(
            F.sum("__ild").cast("double") / F.count("*").cast("double"), 12
        ).alias("ild_mean"),
    )
    cov = lists.agg(
        F.countDistinct("__i").cast("long").alias("n_recommended")
    )
    return (
        ild.crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(catalog_n_df))
        .select(
            "n_queries",
            F.col("catalog_n").cast("long").alias("catalog_n"),
            "n_recommended",
            (
                F.col("n_recommended").cast("double")
                / F.col("catalog_n").cast("double")
            ).alias("coverage_at_k"),
            "ild_mean",
        )
    )


RAKE_STOPWORDS = (
    "the a an and or of to in is are was for on with as by at it this "
    "that be from have has not but they we you i he she its their our"
).split()


def rake_keywords(
    df: DataFrame,
    text_col: str,
    id_col: str,
    topk: int = 20,
    max_phrase_words: int = 4,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al.) over the corpus — the
    unsupervised key-phrase miner next to TF-IDF terms
    (:func:`tfidf_top_terms`): candidate phrases are maximal stopword-
    free token runs; each word scores degree/frequency (degree = total
    length of phrases it appears in), a phrase scores the sum of its
    word scores, and the corpus readout is the top-k phrases by
    (score, phrase) with their occurrence counts.

    All string work is JVM regex (lowercase -> strip non-alnum ->
    stopwords become '|' separators -> split), both score tables are
    map-side-combinable count aggregates over exploded words, and the
    phrase score is one join + sum — no Python anywhere. Degree and
    frequency are exact integers; each word score is ONE double
    division and the phrase score sums <= max_phrase_words of them in
    array order (fixed fold), so the ranking replays in SQL. Returns
    (phrase, n_docs, n_occur, score) with score rounded to 9.
    """
    stops = stopwords if stopwords is not None else RAKE_STOPWORDS
    stop_re = r"\b(" + "|".join(stops) + r")\b"
    cleaned = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "),
        stop_re,
        "|",
    )
    phrases = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(cleaned, r"\|")).alias("__raw"),
    ).select(
        "__id",
        F.regexp_replace(F.trim("__raw"), r"\s+", " ").alias("phrase"),
    ).filter(
        (F.col("phrase") != "")
        & (F.size(F.split(F.col("phrase"), " ")) <= max_phrase_words)
    )
    words = phrases.select(
        "phrase", F.explode(F.split("phrase", " ")).alias("word"),
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
    )
    word_stats = words.groupBy("word").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    wscore = F.col("deg").cast("double") / F.col("freq").cast("double")
    per_phrase = phrases.groupBy("phrase").agg(
        F.countDistinct("__id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_occur"),
    )
    # phrase score: sum of word scores in word order (fixed fold over
    # the split array after joining scores back per distinct word)
    pw = (
        per_phrase.select("phrase")
        .select("phrase", F.posexplode(F.split("phrase", " ")).alias("i", "word"))
        .join(word_stats, "word")
        .groupBy("phrase")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), wscore.alias("ws")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["ws"],
            ).alias("score")
        )
    )
    return (
        per_phrase.join(pw, "phrase")
        .select(
            "phrase", "n_docs", "n_occur", F.round("score", 9).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("phrase").asc())
        .limit(topk)
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str,
    iterations: int = 3,
    damping: float = 0.85,
    top_k: int = 10,
    token_pattern: str = "[^a-z0-9]+",
    min_len: int = 4,
) -> DataFrame:
    """TextRank keyword extraction — PageRank over the corpus-level
    word co-occurrence graph (Mihalcea & Tarau 2004), the graph-based
    complement of RAKE (degree/frequency heuristic) and TF-IDF
    (distinctiveness): a word matters if it co-occurs with words that
    matter.

    Graph construction: tokens shorter than ``min_len`` are dropped
    (the stopword-free stand-in), the survivors re-close into an
    adjacency sequence per document, and each adjacent pair becomes an
    UNDIRECTED edge (both directions, self-pairs dropped, DISTINCT
    corpus-wide). Scoring delegates to graph.pagerank's fixed-sweep,
    decimal-exact recurrence — same 100 TB design: a budgeted number
    of rounds over a once-materialized edge list, never a convergence
    probe. Ranking ties break on the word.

    Scale knobs: ``min_len`` bounds the vocabulary (the node count);
    the DISTINCT edge list is vocabulary-pair-bounded, not
    token-bounded. Returns top_k rows: (word, score).
    """
    from .graph import pagerank

    toks = F.filter(
        F.array_remove(
            F.split(F.lower(F.trim(F.col(text_col))), token_pattern), ""
        ),
        lambda t: F.length(t) >= min_len,
    )
    # guard: sequence(2, n) DESCENDS for n < 2 — short docs get an
    # explicit empty pair list instead of an element_at(0) error
    pairs = (
        df.select(toks.alias("tk"))
        .select(
            F.explode(
                F.when(
                    F.size("tk") >= 2,
                    F.transform(
                        F.sequence(F.lit(2), F.size("tk")),
                        lambda i: F.struct(
                            F.element_at(F.col("tk"), i - 1).alias("a"),
                            F.element_at(F.col("tk"), i).alias("b"),
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("pr")
        )
        .select(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=iterations, damping=damping)
    return (
        ranks.select(F.col("node").alias("word"), F.col("rank").alias("score"))
        .orderBy(F.col("score").desc(), F.col("word"))
        .limit(top_k)
    )
