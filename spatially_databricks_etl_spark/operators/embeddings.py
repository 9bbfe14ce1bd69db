"""Embedding-matrix operators: distributed PCA fit/project (north-star
extension; the reference has no embedding surface at all — its only
numeric transforms are scalar recodes, `Spatially ETL test.py:120-168`).

Scale shape: the fit is ONE corpus pass computing per-Arrow-batch
moment partials (count, Σx, Σxxᵀ) inside ``mapInPandas``; the collect
is O(batches·dim²) — independent of row count — and the dim×dim
eigendecomposition runs on the driver (dim is model width, not data
size: 64–4096 in practice, so the driver work is microseconds to
seconds and never scales with the corpus). Projection is a codegen'd
dot-product expression over literal component arrays — no UDF, no
shuffle, map-only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.vectors import dot


def pca_fit(
    corpus: DataFrame,
    *,
    k: int = 8,
    vec_col: str = "embedding",
) -> dict:
    """Fit PCA on an ``array<float|double>`` column.

    Returns ``{"mean": [dim], "components": [k][dim], "explained_variance": [k]}``
    with orthonormal components in descending-eigenvalue order.

    Implementation: per-batch partials (n, Σx, Σxxᵀ) via Arrow-batched
    ``mapInPandas`` (the classic map-side moment combine — each 100 TB
    partition contributes a few dim²-sized rows), reduced in numpy on
    the driver, then ``eigh`` of the sample covariance
    (Σxxᵀ − n·x̄x̄ᵀ)/(n−1). Sign convention: each component's first
    element with |value| > 1e-9 is made positive, so the decomposition
    is deterministic (eigenvectors are otherwise defined only up to
    sign).
    """
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("ss", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            arrs = [np.asarray(v, dtype=np.float64) for v in pdf[vec_col] if v is not None]
            if not arrs:
                continue
            x = np.stack(arrs)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = corpus.select(vec_col).mapInPandas(partials, schema=out_schema).collect()
    if not rows:
        raise ValueError("pca_fit: empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    dim = s.shape[0]
    ss = np.sum([np.asarray(r["ss"]).reshape(dim, dim) for r in rows], axis=0)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    if not 1 <= k <= dim:
        raise ValueError(f"pca_fit: need 1 <= k ({k}) <= dim ({dim})")
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for c in comps:
        nz = np.where(np.abs(c) > 1e-9)[0]
        if nz.size and c[nz[0]] < 0:
            c *= -1.0
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": evals[order].tolist(),
    }


def pca_project_col(vec: Column, model: dict) -> Column:
    """Projection expression: ``[(x − mean)·c_j for each component]``
    as a pure column expression over literal arrays — codegen'd,
    map-only. The mean offset folds into a per-component constant
    (x·c_j − mean·c_j), so the vector is read once per component."""
    comps = model["components"]
    offsets = [float(np.dot(model["mean"], c)) for c in comps]
    comp_lit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in comps])
    off_lit = F.array(*[F.lit(o) for o in offsets])
    return F.transform(
        comp_lit, lambda c, j: dot(vec, c) - F.get(off_lit, j)
    )


def pca_project(
    df: DataFrame,
    model: dict,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = the k-dimensional PCA projection of
    ``vec_col``. Map-only; no shuffle; no UDF."""
    return df.withColumn(out_col, pca_project_col(F.col(vec_col), model))


def quantize_int8(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    q_col: str = "q",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale`` =
    max(|x|)/127, ``q_i`` = round-half-up(x_i / scale) ∈ [−127, 127]
    (the round is explicit ``floor(x + 0.5)`` so any engine replays it
    bit-identically — SQL ``round`` half-even vs half-up semantics
    differ across engines). An all-zero vector gets scale 0 and an
    all-zero code vector.

    Why it matters at 100 TB: a float32/float64 embedding column is
    4–8 bytes/dim; int8 is 1 — a 4–8× cut in scan, shuffle, persist,
    and index footprint for ANN, at a cosine-similarity error that is
    bounded and testable (recall property in tests). Map-only, no UDF,
    no shuffle; pairs with :func:`dequantize_int8`.
    """
    vec = F.col(vec_col)
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (max_abs / F.lit(127.0)).cast("double")
    q = F.when(
        F.col(scale_col) > 0,
        F.transform(
            vec,
            lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    return df.withColumn(scale_col, scale).withColumn(q_col, q)


def dequantize_int8(
    df: DataFrame,
    *,
    q_col: str = "q",
    scale_col: str = "scale",
    out_col: str = "embedding_deq",
) -> DataFrame:
    """Inverse of :func:`quantize_int8`: ``x̂_i = q_i · scale``.
    Reconstruction error per element ≤ scale/2 = max(|x|)/254."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda qv: (qv * F.col(scale_col)).cast("double")),
    )
