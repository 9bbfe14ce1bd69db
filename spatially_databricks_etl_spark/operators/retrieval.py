"""BM25 full-text retrieval over a document corpus (north-star
extension; the reference has no text search at all — its only string
ops are scalar recodes, `Spatially ETL test.py:120-168`).

Okapi BM25 (Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond", 2009) re-expressed as DataFrame algebra:

- postings build: tokenize → explode → per-(doc, term) tf + per-doc
  length — one shuffle on (doc, term), the classic inverted-index
  map-reduce;
- corpus statistics (N, avgdl) ride a ONE-ROW broadcast frame, and
  per-term document frequencies join the postings on the term key;
- query matching: the (small) query-term set broadcasts into an
  equi-join against the postings — the corpus never shuffles for a
  query batch, only the MATCHED postings shuffle into the per-(query,
  doc) score sum;
- ranking: windowed top-k per query, ties on doc id.

Everything is codegen expressions (no UDF); the tokenizer is a plain
lowercase + non-alphanumeric split chosen precisely because any engine
reproduces it, which is what lets the DuckDB oracle replay the whole
scoring pipeline value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.operators.similarity import (
    ANN_MAX_QUERIES,
    check_query_batch,
)

#: Tokenizer contract shared with the SQL oracle: lowercase, split on
#: runs of non-[a-z0-9], drop empties. Deliberately engine-portable.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_col(text: Column | str) -> Column:
    """``array<string>`` of lowercase alphanumeric tokens."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), TOKEN_SPLIT_RE), lambda x: x != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    quantize: int | None = None,
    max_queries: int | None = ANN_MAX_QUERIES,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
                  (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl)),
    idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))  (Lucene form,
    never negative). Repeated query terms count once (set semantics —
    the common practical choice; duplicate a term in the query frame
    to weight it).

    Returns (query_id, doc_id, score, rank), rank by (score DESC,
    doc_id) so exact-duplicate documents order deterministically.

    ``quantize=q`` ranks by — and emits — the exact integer
    ``floor(score·10^q + 0.5)`` instead of the raw double. The score
    is a float SUM whose addend order is engine- and partition-
    dependent, so two documents with identical term statistics (exact
    duplicates exist in any real corpus) can land 1 ulp apart in one
    engine and exactly equal in another, flipping their rank order;
    quantizing collapses ulp noise so the ranking replays
    bit-identically anywhere (the cross-engine determinism idiom used
    throughout this repo for derived continuous scores).

    Scale shape: the postings build is one shuffle of (doc, term)
    pairs; df is one aggregate over distinct postings; N/avgdl ride a
    one-row broadcast frame (never a driver round-trip); the query
    terms broadcast into the postings join, so per-batch cost is
    proportional to MATCHED postings, not the corpus. For a standing
    corpus, persist the postings + stats frames once (index build)
    and reuse across query batches — the same build-once/search-many
    split as the ANN index paths.

    The query-term frame BROADCASTS, so the batch is bounded by the
    same contract as the ANN entry points: ``max_queries`` (default
    ``similarity.ANN_MAX_QUERIES``) fails fast on an oversized batch
    instead of letting the broadcast blow up — split the batch or
    raise the ceiling explicitly (``None`` opts out).
    """
    from spatially_databricks_etl_spark.operators.relational import top_k_per_group

    check_query_batch(queries, "bm25_topk", max_queries)

    post = (
        docs.select(
            F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("__toks")
        )
        .withColumn("__dl", F.size("__toks"))
        .select("doc_id", "__dl", F.explode("__toks").alias("term"))
        .groupBy("doc_id", "__dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.avg(F.size(tokens_col(text_col))).alias("__avgdl"),
    )
    df_t = post.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tokens_col(query_col)).alias("term"),
        )
        .distinct()
    )
    matched = (
        post.join(F.broadcast(qterms), "term")
        .join(df_t, "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0 + (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    scored = (
        matched.withColumn("__c", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__c").alias("score"))
    )
    if quantize is not None:
        scored = scored.withColumn(
            "score",
            F.floor(F.col("score") * F.lit(float(10**quantize)) + F.lit(0.5)).cast(
                "long"
            ),
        )
    out = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id")],
        k,
        rank_col="rank",
    )
    return out.select("query_id", "doc_id", "score", "rank")


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    *,
    k: int = 60,
    topk: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    quantize: int | None = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) of two ranked retrieval lists — the standard hybrid-search
    combiner (lexical BM25 ⊕ vector ANN) every RAG / data-curation
    retrieval stack runs: score(d) = Σ_lists 1/(k + rank_list(d)),
    with a document missing from one list contributing 0 from it.
    ``k=60`` is the canonical damping constant from the paper.

    Inputs are rank frames (query_id, doc_id, rank) — e.g.
    :func:`bm25_topk` output and ``similarity.brute_force_topk`` /
    any ANN top-k with its id column aliased. The fusion is ONE
    full-outer equi-join on (query_id, doc_id) over two already
    per-query-bounded lists (≤ per-side k rows per query), so the
    joined frame is tiny regardless of corpus size — all the heavy
    lifting stays in the per-modality retrievers. Ranks are small
    exact integers, so both engines derive bit-identical 1/(k+rank)
    doubles in a fixed addition order; ``quantize`` additionally pins
    the e6 floor-idiom integer so the fused ranking replays anywhere
    (ties break on doc id).

    Returns (query_id, doc_id, score, rank) with rank ≤ ``topk``.
    """
    from spatially_databricks_etl_spark.operators.relational import top_k_per_group

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ra = a.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("__ra"),
    )
    rb = b.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("__rb"),
    )
    fused = ra.join(rb, ["query_id", "doc_id"], "full_outer").withColumn(
        "score",
        F.coalesce(F.lit(1.0) / (F.lit(float(k)) + F.col("__ra")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(float(k)) + F.col("__rb")), F.lit(0.0)),
    )
    if quantize is not None:
        fused = fused.withColumn(
            "score",
            F.floor(F.col("score") * F.lit(float(10**quantize)) + F.lit(0.5)).cast(
                "long"
            ),
        )
    out = top_k_per_group(
        fused,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id")],
        topk,
        rank_col="rank",
    )
    return out.select("query_id", "doc_id", "score", "rank")


def bm25_write_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the BM25 inverted index: the postings
    (term, doc_id, dl, tf) RANGE-SORTED by term so every parquet
    file's footer min/max spans a narrow term range and a query's
    ``term IN (...)`` scan filter skips whole files, plus the
    per-term document frequencies (same layout) and the scalar
    corpus stats (N, avgdl) as a one-row ``_bm25_meta`` sidecar.

    This is the ingest-time half of the retrieval story — the same
    build-once / search-many split as the LSH/IVF/IVF-PQ indexes:
    tokenization and the (doc, term) shuffle happen once at write;
    a search touches only the postings files whose term range
    overlaps the query's terms.
    """
    import json

    post = (
        docs.select(
            F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("__toks")
        )
        .withColumn("dl", F.size("__toks"))
        .select("doc_id", "dl", F.explode("__toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    (
        post.repartitionByRange("term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    spark = docs.sparkSession
    post_idx = spark.read.parquet(f"{path}/postings")
    (
        post_idx.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
        .repartitionByRange("term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/df")
    )
    row = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(tokens_col(text_col))).alias("avgdl"),
    ).first()
    spark.createDataFrame(
        [(json.dumps({"n_docs": row["n_docs"], "avgdl": row["avgdl"]}),)],
        "bm25_meta_json string",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/_bm25_meta")


def bm25_search_index(
    queries: DataFrame,
    path: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_col: str = "query",
    quantize: int | None = None,
    max_queries: int | None = ANN_MAX_QUERIES,
) -> DataFrame:
    """Search a persisted BM25 index (see :func:`bm25_write_index`):
    the query-term set becomes an ``IN`` filter PUSHED into the
    postings and df scans (range-sorted layout → footer min/max file
    skipping), the scalar stats come from the sidecar, and scoring +
    ranking match :func:`bm25_topk` exactly over the same corpus
    (pinned by test). The distinct-term collect is query-batch-sized,
    and the batch size is ENFORCED, not just documented:
    ``check_query_batch`` (default ceiling
    ``similarity.ANN_MAX_QUERIES``) raises before the collect on a
    degenerate mega-batch — the same contract as the LSH/IVF/IVF-PQ
    index routers."""
    import json

    from spatially_databricks_etl_spark.operators.relational import top_k_per_group

    check_query_batch(queries, "bm25_search_index", max_queries)
    spark = queries.sparkSession
    meta = json.loads(
        spark.read.json(f"{path}/_bm25_meta").collect()[0]["bm25_meta_json"]
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tokens_col(query_col)).alias("term"),
        )
        .distinct()
    )
    terms = sorted({r["term"] for r in qterms.select("term").distinct().collect()})
    post = spark.read.parquet(f"{path}/postings").filter(F.col("term").isin(terms))
    df_t = spark.read.parquet(f"{path}/df").filter(F.col("term").isin(terms))
    matched = post.join(F.broadcast(qterms), "term").join(F.broadcast(df_t), "term")
    n_docs, avgdl = float(meta["n_docs"]), float(meta["avgdl"])
    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    scored = (
        matched.withColumn("__c", idf * F.col("tf") * (k1 + 1.0) / denom)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__c").alias("score"))
    )
    if quantize is not None:
        scored = scored.withColumn(
            "score",
            F.floor(F.col("score") * F.lit(float(10**quantize)) + F.lit(0.5)).cast(
                "long"
            ),
        )
    out = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id")],
        k,
        rank_col="rank",
    )
    return out.select("query_id", "doc_id", "score", "rank")
