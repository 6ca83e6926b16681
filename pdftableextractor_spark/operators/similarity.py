"""Similarity search over an embedding column (array<float>).

Two paths, same result contract (vec_id, cos):

  cosine_topk   brute-force exact top-k — the correctness baseline; one scan,
                one ordered limit (Spark runs TakeOrderedAndProject: per-
                partition heaps, no full sort shuffle).
  ivf_topk      the scale path: coarse inverted-file search. Partition
                centroids come from a groupBy-avg over a cluster-id column
                (here the corpus 'label'; at 100 TB a k-means assignment);
                rank cells by centroid cosine, probe the top ``nprobe``
                cells, brute-force inside. Probing 2/5 of uniform cells
                scans ~40% of vectors — the recall/cost dial is nprobe.

All dot/norm math is JVM-side higher-order-function work (dedup.cosine_col);
no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdftableextractor_spark.operators.dedup import cosine_col


def _query_lit(query_vec) -> object:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    embeddings: DataFrame, query_vec, k: int = 10
) -> DataFrame:
    """Exact brute-force top-k by cosine; deterministic tie-break on vec_id."""
    q = _query_lit(query_vec)
    return (
        embeddings.select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_centroids(embeddings: DataFrame, cell_col: str = "label") -> DataFrame:
    """Per-cell mean vector: (cell, centroid array<double>). Element-wise mean
    via posexplode + groupBy(cell, dim) + array_agg reassembly — scales to any
    dimension without Python."""
    dims = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.posexplode("embedding").alias("dim", "v"),
    )
    per_dim = dims.groupBy("cell", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    return per_dim.groupBy("cell").agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "m"))
        ).getField("m").alias("centroid")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7):
    """Deterministic random hyperplanes (md5-seeded, no global RNG)."""
    import hashlib

    import numpy as np

    h = hashlib.md5(f"lsh:{seed}:{dim}:{n_planes}".encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(emb_col, planes) -> object:
    """Sign-bit bucket id from dot products with fixed hyperplanes — built
    from aggregate/zip_with expressions (no UDF): bucket = Σ 2^i·[v·p_i > 0]."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                emb_col,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 4,
) -> DataFrame:
    """Random-hyperplane LSH ANN: brute-force only the query's sign bucket.
    With n_planes=4 a uniform corpus scans ~1/16 of the vectors; recall
    falls for near-orthogonal neighbors — the standard LSH trade; multiple
    rotated tables would recover it (one table here)."""
    import numpy as np

    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    qv = np.asarray(list(query_vec), dtype=np.float64)
    q_bucket = int(sum((1 << i) for i, p in enumerate(planes) if p @ qv > 0))
    q = _query_lit(query_vec)
    cand = embeddings.withColumn(
        "bucket", lsh_bucket_col(F.col("embedding"), planes)
    ).filter(F.col("bucket") == q_bucket)
    return (
        cand.select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    cell_col: str = "label",
) -> DataFrame:
    """IVF approximate top-k: rank cells by centroid cosine, brute-force only
    the best ``nprobe`` cells."""
    q = _query_lit(query_vec)
    cents = ivf_centroids(embeddings, cell_col)
    probe_cells = (
        cents.select(
            "cell", cosine_col(F.col("centroid"), q).alias("ccos")
        )
        .orderBy(F.desc("ccos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    cand = embeddings.join(
        F.broadcast(probe_cells),
        embeddings[cell_col] == probe_cells["cell"],
    )
    return (
        cand.select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )
