"""Similarity search over embedding columns (north-star extension).

Two tiers, as a 100 TB pipeline needs both:

- ``brute_force_topk``: exact top-k cosine. The query set is
  broadcast; the corpus is scanned ONCE with a codegen'd dot product
  and reduced via per-group top-k (window) — no corpus shuffle at
  all when k-per-query fits in a partition-local heap via
  TakeOrdered-style pruning. This is the correctness baseline.

- ``lsh_bucketed_topk`` / ``cosine_self_join_pairs``: random-
  hyperplane (sign) LSH. Vectors land in 2^planes buckets; only
  same-bucket candidates are scored. Bucket id is a plain integer
  column → the candidate join is an equi-join (sparse shuffle), the
  scale path for corpus-vs-corpus search.

Embeddings stay ``array<float>``; all arithmetic is double via
zip_with/aggregate (functions/vectors.py) — no UDF in any hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.vectors import cosine_similarity, dot
from spatially_databricks_etl_spark.operators.relational import (
    ensure_parallelism,
    top_k_per_group,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast); the corpus scan is a
    single pass. Ties break on neighbor id for determinism.
    Returns (query_id, neighbor_id, cosine_sim, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")),
        "neighbor_id",
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine_sim", cosine_similarity(F.col("__qvec"), F.col("__cvec"))
    )
    out = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id")],
        k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "rank")


def _hyperplanes(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(planes, dim)


def lsh_bucket(vec_col: Column | str, planes: np.ndarray) -> Column:
    """Random-hyperplane bucket id: bit i = sign(v · plane_i). The
    planes ship as literal arrays (tiny) so the whole expression is
    codegen'd — no UDF, no broadcast variable needed."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, lit_plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket candidates.

    The candidate join is an equi-join on the integer bucket id, so
    the corpus shuffles once by bucket (or not at all if the bucketed
    corpus is pre-materialized — do that at ingest for repeated
    querying). Recall rises with fewer planes / multi-probe; 8 planes
    ≈ 256 buckets is a reasonable sf0.1 default.
    """
    hp = _hyperplanes(dim, planes, seed)
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")),
        "neighbor_id",
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    c = c.withColumn("__bucket", lsh_bucket("__cvec", hp))
    q = q.withColumn("__bucket", lsh_bucket("__qvec", hp))
    scored = c.join(F.broadcast(q), on="__bucket").withColumn(
        "cosine_sim", cosine_similarity(F.col("__qvec"), F.col("__cvec"))
    )
    out = top_k_per_group(
        scored, ["query_id"], [F.col("cosine_sim").desc(), F.col("neighbor_id")], k, rank_col="rank"
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "rank")


def cosine_self_join_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.9,
    planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    from LSH bucket equality (corpus-vs-corpus without the quadratic
    cross join). Returns (id_a, id_b, cosine_sim), id_a < id_b."""
    hp = _hyperplanes(dim, planes, seed)
    base = ensure_parallelism(
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")), "__id"
    )
    bucketed = base.withColumn("__bucket", lsh_bucket("__vec", hp))
    left = bucketed.select(F.col("__id").alias("id_a"), F.col("__vec").alias("__va"), "__bucket")
    right = bucketed.select(F.col("__id").alias("id_b"), F.col("__vec").alias("__vb"), "__bucket")
    return (
        left.join(right, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine_similarity(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
        .dropDuplicates(["id_a", "id_b"])
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus by
    nearest coarse centroid, probe only the ``nprobe`` centroids
    closest to each query.

    Coarse quantizer: ``n_centroids`` corpus vectors chosen by hashed
    id (deterministic, seed-stable — a k-means refinement would drop
    in here without changing the plan). Centroid count is independent
    of corpus size, so collecting them to the driver is O(centroids),
    not O(data); they re-enter the plan as codegen'd literal arrays.

    Plan shape at scale: one narrow corpus pass assigns each vector to
    its cell (argmax over ``n_centroids`` codegen'd dot products — no
    UDF, no shuffle); queries explode to ``nprobe`` (query, cell) rows
    and BROADCAST into an equi-join on cell id, so the corpus never
    shuffles; exact cosine + windowed top-k inside the probed cells
    only. Expected work vs brute force: ``nprobe/n_centroids`` of the
    corpus scored per query. Recall is approximate — unit tests check
    recall@k against ``brute_force_topk``; no SQL oracle.

    Pre-materialize the assigned corpus (partitioned by ``__cell``) at
    ingest for repeated querying: probes then become partition-pruned
    scans.
    """
    sample = (
        corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col("__cid").cast("string"), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r["__v"]] for r in sample]
    inv_norms = [1.0 / float(np.linalg.norm(c) or 1.0) for c in cents]

    # one nested literal (centroids pre-scaled by 1/|c_j|) + an
    # indexed transform keeps the expression tree O(1) in n_centroids
    # (vs n_centroids separate dot expressions — compile time grows
    # with tree size, and this path is re-planned per query batch)
    scaled = [[x * inv_norms[j] for x in c] for j, c in enumerate(cents)]
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in scaled])

    def cell_sims(vec: Column) -> Column:
        # |v| is constant across centroids, so argmax over
        # dot(v, c_j)/|c_j| == argmax over cosine — skip |v|.
        return F.transform(
            cents_lit,
            lambda c, j: F.struct(dot(vec, c).alias("sim"), j.alias("cell")),
        )

    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")),
        "neighbor_id",
    )
    assigned = c.withColumn("__cell", F.array_max(cell_sims(F.col("__cvec"))).getField("cell"))

    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    probes = q.withColumn(
        "__cell",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(cell_sims(F.col("__qvec")))), 1, nprobe),
                lambda s: s.getField("cell"),
            )
        ),
    )

    scored = assigned.join(F.broadcast(probes), on="__cell").withColumn(
        "cosine_sim", cosine_similarity(F.col("__qvec"), F.col("__cvec"))
    )
    out = top_k_per_group(
        scored, ["query_id"], [F.col("cosine_sim").desc(), F.col("neighbor_id")], k, rank_col="rank"
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "rank")


def fuzzy_join(
    corpus: DataFrame,
    probe: DataFrame,
    *,
    corpus_col: str,
    probe_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """EXACT bounded-edit-distance join: every (probe, corpus) pair
    with ``levenshtein ≤ max_distance``. No reference analog — its
    only string normalization is a regex strip, `Spatially ETL
    test.py:156-157`.

    Scale shape: an edit of ≤ k changes length by ≤ k, so each probe
    row is exploded into the 2k+1 candidate lengths and the candidate
    step is an EQUI-join on exact string length — a hash shuffle,
    never a cross or theta join — followed by the levenshtein verify
    on the (small) banded candidate set. Both sides scan once; the
    blocking is lossless, so the result is exact.
    """
    k = max_distance
    c = corpus.withColumn("__len", F.length(corpus_col))
    p = probe.withColumn(
        "__len",
        F.explode(
            F.sequence(
                F.greatest(F.length(probe_col) - k, F.lit(0)),
                F.length(probe_col) + k,
            )
        ),
    )
    cand = p.join(c, on="__len")
    return (
        cand.withColumn("distance", F.levenshtein(probe_col, corpus_col))
        .filter(F.col("distance") <= k)
        .drop("__len")
    )
