"""Vector similarity search over embedding columns [SURVEY §2.11 N3].

Brute-force cosine top-k is the exact baseline; the scale path is
LSH bucketing (random-hyperplane signs) that prunes candidates before
the exact re-rank. Dot products run inside codegen via zip_with +
aggregate (elements widened to double BEFORE multiply, left-fold
accumulation — bit-compatible with the DuckDB oracle's
list_inner_product over DOUBLE[]).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force).

    The query side is broadcast — the candidate scan never shuffles;
    ranking is a per-query-partition window top-k, no global sort.
    """
    from pyspark.sql import Window

    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cos"), F.col("rk").cast("long").alias("rk"))
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs [N1 embedding variant]."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH variant: bucket vectors by the sign
    pattern of ``n_planes`` pseudo-random projections, probe only the
    query's bucket, exact re-rank inside. At 100 TB this turns a full
    scan per query into a bucket lookup; planes are deterministic
    (seeded from the element index) so results are reproducible.

    Recall is approximate by construction — this is the scale path,
    checked rows-only (the exact baseline above is the oracle-checked
    one).
    """
    from pyspark.sql import Window

    def signature(vec: Column) -> Column:
        sig = F.lit("")
        for p in range(n_planes):
            # Deterministic plane p: weight_i = sin(p * 1000 + i).
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda x, i: x.cast("double") * F.sin(i + p * 1000),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = F.concat(sig, F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        return sig

    emb = embeddings.withColumn("bucket", signature(F.col(vec_col)))
    q = emb.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    c = emb.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "bucket")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cos"), F.col("rk").cast("long").alias("rk"))
    )


def ivf_index(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer [N3 scale path]: centroids from the label
    partitions (stand-in for a k-means fit — at scale the centroids
    come from MLlib KMeans on a sample; the index/probe machinery here
    is identical), plus the inverted-list assignment of every vector
    to its nearest centroid.

    Returns (centroids: label/centroid, assignments: id/cell).
    """
    import pyspark.sql.functions as F

    # centroid[d] = avg of element d within the label group
    pos = embeddings.select(
        label_col, F.posexplode(vec_col).alias("pos", "val")
    )
    cent = (
        pos.groupBy(label_col, "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("c"))
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )
    vecs = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    )
    scored = vecs.crossJoin(F.broadcast(cent)).withColumn(
        "sim", cosine(F.col("cvec"), F.col("centroid"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cand_id").orderBy(F.col("sim").desc(), F.col(label_col))
    assign = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cand_id", F.col(label_col).alias("cell"))
    )
    return cent, assign


def ivf_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF probe: rank centroids per query, search only the vectors in
    the ``nprobe`` nearest inverted lists, exact cosine re-rank inside.
    At 100 TB the probed lists are a small fraction of the corpus —
    the scan cost drops by ~n_cells/nprobe. Approximate by
    construction -> rows-only check; recall vs the brute-force
    baseline is asserted in tests."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    cent, assign = ivf_index(embeddings, id_col, vec_col, label_col)
    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    qcells = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("sim", cosine(F.col("qvec"), F.col("centroid")))
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(label_col))
            ),
        )
        .filter(F.col("crk") <= nprobe)
        .select("query_id", "qvec", F.col(label_col).alias("cell"))
    )
    cands = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    ).join(assign, "cand_id")
    scored = (
        cands.join(F.broadcast(qcells), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cos"),
                F.col("rk").cast("long").alias("rk"))
    )
