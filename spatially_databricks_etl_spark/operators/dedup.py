"""Deduplication operators for training-data pipelines (north-star
extension; absent from the reference — SURVEY.md §2b).

All implementations are pure DataFrame compositions over built-in
functions (xxhash64, higher-order array fns, bit ops) — no Python
UDFs, no ML-library dependency — so they run inside whole-stage
codegen and scale with the cluster:

- exact_dedup:        hash-groupBy, one shuffle on the dedup key.
- minhash_near_dedup: shingle → minhash signature → banded LSH →
                      bucket self-join → exact-Jaccard verify.
- simhash:            64-bit sign-hash fingerprint; near-dup via
                      chunk-banding + popcount(xor) Hamming verify.
- ngram_jaccard_pairs: inverted-index (explode→join) candidate pairs
                      with hot-shingle pruning, exact Jaccard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.text import ngrams, tokens


def exact_dedup(df: DataFrame, subset: list[str], *, keep_by: str | None = None) -> DataFrame:
    """Exact dedup on ``subset``. With ``keep_by`` (a unique orderable
    column, e.g. doc_id) the survivor is deterministic: min(keep_by)
    per group — one hash-aggregate shuffle, map-side partials first.
    Without it, ``dropDuplicates`` (arbitrary survivor, cheapest).
    """
    if keep_by is None:
        return df.dropDuplicates(subset)
    w_cols = [F.col(c) for c in subset]
    keep = df.groupBy(*w_cols).agg(F.min(keep_by).alias(keep_by))
    return df.join(keep, on=[*subset, keep_by], how="left_semi")


def minhash_signature(
    shingle_col: Column, *, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature: array of ``num_hashes`` minima of seeded
    xxhash64 over the (distinct) shingle set. One pass per row,
    vectorized by codegen — no UDF."""
    distinct = F.array_distinct(shingle_col)
    sigs = [
        F.array_min(F.transform(distinct, lambda s: F.xxhash64(F.lit(seed + i), s)))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two array columns (distinct semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_near_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_size: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    Plan shape (scale analysis): per-row signature (narrow, codegen) →
    explode to ``bands`` rows/doc → shuffle on (band, band_hash) — the
    only shuffle, keyed by bucket so co-candidates co-locate →
    self-join inside buckets → distinct pair → exact-Jaccard verify on
    the shingle arrays. With b=16, r=4 the S-curve crosses ~0.72, so
    threshold=0.8 pairs are found w.h.p. while the bucket join stays
    sparse. Returns (id_a, id_b, jaccard_sim) with id_a < id_b.
    """
    rows = num_hashes // bands
    sh = ngrams(F.col(text_col), shingle_size, character=True)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(sh).alias("__shingles"),
    ).withColumn("__sig", minhash_signature(F.col("__shingles"), num_hashes=num_hashes, seed=seed))

    banded = base.select(
        "__id",
        "__shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws("_", F.slice("__sig", b * rows + 1, rows)), b).alias(
                        "band_hash"
                    ),
                ),
            )
        ).alias("__b"),
    ).select("__id", "__shingles", F.col("__b.band").alias("__band"), F.col("__b.band_hash").alias("__bh"))

    left = banded.select(
        F.col("__id").alias("id_a"), F.col("__shingles").alias("__sh_a"), "__band", "__bh"
    )
    right = banded.select(
        F.col("__id").alias("id_b"), F.col("__shingles").alias("__sh_b"), "__band", "__bh"
    )
    cand = (
        left.join(right, on=["__band", "__bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sh_a", "__sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard_sim", jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash(text_col: Column | str, *, bits: int = 64, seed: int = 42) -> Column:
    """64-bit SimHash fingerprint: per-token xxhash64; each bit votes
    +1/-1; sign of the vote → bit. Pure higher-order-function
    composition (sequence/transform/aggregate + bit ops)."""
    toks = tokens(text_col)
    hashes = F.array_distinct(
        F.transform(F.array_distinct(toks), lambda t: F.xxhash64(t, F.lit(seed)))
    )
    def bit_vote(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(bits):
        vote = F.aggregate(hashes, F.lit(0), bit_vote(i))
        out = out.bitwiseOR(
            F.when(vote > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_near_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    chunks: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the 64-bit fingerprint into ``chunks``
    16-bit chunks; any pair within Hamming d < chunks shares ≥1 exact
    chunk, so candidates come from equality joins on (chunk_idx,
    chunk_value) — a sparse shuffle — then verified with
    ``bit_count(a XOR b)``. Returns (id_a, id_b, hamming).
    """
    width = 64 // chunks
    mask = (1 << width) - 1
    base = df.select(F.col(id_col).alias("__id"), simhash(text_col, seed=seed).alias("__sh"))
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col("__sh"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("cv"),
            )
            for i in range(chunks)
        ]
    )
    banded = base.select(
        "__id", "__sh", F.explode(chunk_structs).alias("__c")
    ).select("__id", "__sh", F.col("__c.chunk").alias("__chunk"), F.col("__c.cv").alias("__cv"))
    left = banded.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"), "__chunk", "__cv")
    right = banded.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"), "__chunk", "__cv")
    cand = (
        left.join(right, on=["__chunk", "__cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sh_a", "__sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("__sh_a").bitwiseXOR(F.col("__sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_df_fraction: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs from an
    inverted index (explode shingle → equi-join on shingle).

    Hot-shingle pruning: shingles present in more than
    ``max_df_fraction`` of docs are dropped from the index (they can
    only generate quadratic candidates and carry no discriminative
    signal) — the standard posting-list cap that keeps the shuffle
    from exploding at corpus scale. Verification still uses the FULL
    shingle sets, so returned similarities are exact.
    """
    total = df.count()
    cap = max(2, int(total * max_df_fraction))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(ngrams(F.col(text_col), n, character=True)).alias("__sh"),
    )
    posting = base.select("__id", F.explode("__sh").alias("__g"))
    rare = posting.groupBy("__g").agg(F.count("*").alias("__df")).filter(F.col("__df") <= cap)
    posting = posting.join(rare.select("__g"), on="__g")
    pairs = (
        posting.alias("a")
        .join(posting.alias("b"), on="__g")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    sh_b = base.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    return (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )
