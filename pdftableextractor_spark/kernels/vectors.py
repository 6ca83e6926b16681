"""Vectorized embedding kernels: one numpy matmul per Arrow batch.

Replaces the interpreted higher-order-function cosine math (round-1 verdict:
``F.aggregate``/``F.zip_with`` lambdas are interpreted per element — O(dim)
interpreted work per row, the dominant cost at 1024-d embedding scale).
These kernels move the math to numpy over Arrow batches (one BLAS matmul per
~10^4-row batch), the sanctioned Pandas-UDF vectorization shape. Float64
semantics are identical to the old JVM expressions, so every DuckDB oracle
is unchanged.

Contract: embedding columns are non-null with a fixed dimension (the
multimodal/embedding table schema guarantees this); a ragged batch raises in
``np.vstack`` rather than silently mis-shaping.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def _matrix(s: pd.Series) -> np.ndarray:
    return np.vstack(s.to_numpy()).astype(np.float64, copy=False)


def cosine_to_query_udf(query_vec):
    """UDF: cosine(embedding, fixed query vector). The query is embedded in
    the closure, shipped once per executor; each Arrow batch is one
    matrix-vector product."""
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    @pandas_udf("double")
    def k(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            if not len(s):
                yield pd.Series(np.empty(0, dtype=np.float64))
                continue
            m = _matrix(s)
            dots = m @ q
            norms = np.sqrt(np.einsum("ij,ij->i", m, m))
            yield pd.Series(dots / (norms * qn))

    return k


def pairwise_cosine_udf():
    """UDF: row-wise cosine(emb_a, emb_b) of two embedding columns — the
    join-verify kernel for embedding_near_dups. einsum keeps it one fused
    pass per batch (no per-row Python)."""

    @pandas_udf("double")
    def k(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        for sa, sb in batches:
            if not len(sa):
                yield pd.Series(np.empty(0, dtype=np.float64))
                continue
            a, b = _matrix(sa), _matrix(sb)
            dots = np.einsum("ij,ij->i", a, b)
            na = np.sqrt(np.einsum("ij,ij->i", a, a))
            nb = np.sqrt(np.einsum("ij,ij->i", b, b))
            yield pd.Series(dots / (na * nb))

    return k


def nearest_centroid_udf(centroids):
    """UDF: index of the cosine-nearest centroid — the k-means assignment
    step. Centroids (k × dim, small) ride the closure; each Arrow batch is
    one (batch × k) matmul + argmax. Ties break to the lowest index
    (np.argmax), deterministically."""
    c = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    cn = np.sqrt(np.einsum("ij,ij->i", c, c))
    cn[cn == 0.0] = 1.0

    @pandas_udf("int")
    def k(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            if not len(s):
                yield pd.Series(np.empty(0, dtype=np.int32))
                continue
            m = _matrix(s)
            norms = np.sqrt(np.einsum("ij,ij->i", m, m))
            norms[norms == 0.0] = 1.0
            sims = (m @ c.T) / np.outer(norms, cn)
            yield pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return k


def lsh_bucket_udf(planes):
    """UDF: sign-bit LSH bucket id — bucket = Σ 2^i·[v·p_i > 0]. One
    (batch × planes.T) matmul replaces n_planes interpreted aggregates
    per row."""
    p = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    weights = (np.int64(1) << np.arange(p.shape[0], dtype=np.int64))

    @pandas_udf("long")
    def k(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            if not len(s):
                yield pd.Series(np.empty(0, dtype=np.int64))
                continue
            bits = (_matrix(s) @ p.T) > 0
            yield pd.Series(bits @ weights)

    return k
