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
