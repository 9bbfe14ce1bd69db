from spatially_databricks_etl_spark.operators.relational import (
    asof_join,
    bloom_build,
    bloom_prune,
    bloom_prune_join,
    broadcast_join,
    range_join,
    salted_join,
    top_k,
    top_k_per_group,
)
from spatially_databricks_etl_spark.operators.curate import (
    curate_corpus,
    dedup_lines,
    negative_samples,
)
from spatially_databricks_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dedup,
    minhash_search_index,
    minhash_write_index,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dedup,
)
from spatially_databricks_etl_spark.operators.embeddings import (
    dequantize_int8,
    pca_fit,
    pca_project,
    quantize_int8,
)
from spatially_databricks_etl_spark.operators.profile import (
    skew_profile,
)
from spatially_databricks_etl_spark.operators.similarity import (
    brute_force_topk,
    cosine_self_join_pairs,
    ivf_build,
    ivf_search_index,
    ivf_topk,
    ivf_write_index,
    lsh_bucketed_topk,
)

__all__ = [
    "asof_join",
    "bloom_build",
    "bloom_prune",
    "bloom_prune_join",
    "curate_corpus",
    "dedup_lines",
    "dequantize_int8",
    "negative_samples",
    "pca_fit",
    "pca_project",
    "quantize_int8",
    "skew_profile",
    "broadcast_join",
    "range_join",
    "salted_join",
    "top_k",
    "top_k_per_group",
    "exact_dedup",
    "minhash_near_dedup",
    "minhash_search_index",
    "minhash_write_index",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_dedup",
    "brute_force_topk",
    "cosine_self_join_pairs",
    "ivf_build",
    "ivf_search_index",
    "ivf_topk",
    "ivf_write_index",
    "lsh_bucketed_topk",
]
