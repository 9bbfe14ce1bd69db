from spatially_databricks_etl_spark.operators.relational import (
    asof_join,
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
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dedup,
)
from spatially_databricks_etl_spark.operators.embeddings import (
    pca_fit,
    pca_project,
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
    "curate_corpus",
    "dedup_lines",
    "negative_samples",
    "pca_fit",
    "pca_project",
    "broadcast_join",
    "range_join",
    "salted_join",
    "top_k",
    "top_k_per_group",
    "exact_dedup",
    "minhash_near_dedup",
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
