"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
is the scale path (candidate set shrinks by the bucket collision rate).
Dot products unroll to flat codegen expressions when the dimension is
known (see _dot — Spark's array higher-order functions are interpreted);
no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b, dim: int | None = None):
    """Dot product. With a known ``dim``, unroll to a flat sum of
    element_at products — plain expressions stay in whole-stage codegen,
    while the array higher-order form (aggregate/zip_with) is
    INTERPRETED and measured ~20x slower in the pair-scoring hot loop."""
    if dim is not None:
        terms = [
            F.element_at(a, i + 1).cast("double")
            * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a, dim: int | None = None):
    return F.sqrt(_dot(a, a, dim))


def brute_force_cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query. Scale: corpus side is never shuffled — the
    broadcast-nested-loop join streams it once; ranking shuffles only
    (n_queries * corpus) slim score rows, and at real scale you swap the
    window for a per-partition top-k + merge (same semantics)."""
    # norms are precomputed per side BEFORE the join: the per-pair
    # expression is then a single dim-term dot instead of dot + two
    # norms (3x the flops and 3x the generated code — identical values,
    # the norm is the same left-fold either way)
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col), dim).alias("qn"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col), dim).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qvec"), F.col("cvec"), dim)
                / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic signed-random-projection hyperplanes (host-side
    constants baked into the plan as literals)."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64([seed, dim, n_planes]))
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """SRP-LSH bucket id: sign bits of <v, plane_i> packed into a long."""
    dim = len(planes[0])
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(
            _dot(vec_col, arr, dim) > 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def ivf_cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """IVF-style approximate top-k: a seeded KMeans coarse quantizer
    partitions the corpus into ``nlist`` inverted lists; each query
    probes its ``nprobe`` nearest centroids and reranks exactly within
    those lists.

    Scale: the corpus is scanned once to assign lists (a narrow pass);
    the candidate join is an equi-join on list id touching ~nprobe/nlist
    of the corpus per query. Centroids are driver-side literals —
    nlist*dim floats — broadcast implicitly in the plan. The KMeans fit
    is MLlib (seeded, deterministic given the corpus)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    train = corpus.select(
        array_to_vector(F.col("cvec").cast("array<double>")).alias("features")
    )
    km = KMeans(k=nlist, seed=seed, maxIter=10).fit(train)
    centroids = [list(map(float, c)) for c in km.clusterCenters()]

    def nearest_lists(vec, n):
        """Ranked list ids by squared L2 distance to each centroid —
        expression-only (no model UDF in the hot path)."""
        dists = []
        for li, c in enumerate(centroids):
            arr = F.array(*[F.lit(x) for x in c])
            d2 = _dot(vec, vec, dim) - 2 * _dot(vec, arr, dim) + sum(
                x * x for x in c
            )
            dists.append(F.struct(d2.alias("d2"), F.lit(li).alias("list_id")))
        ranked = F.array_sort(F.array(*dists))
        return F.slice(ranked, 1, n)

    assigned = corpus.withColumn(
        "list_id", nearest_lists(F.col("cvec"), 1)[0]["list_id"]
    ).withColumn("cn", _norm(F.col("cvec"), dim))
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col), dim).alias("qn"),
    ).withColumn(
        "probe", F.explode(F.transform(
            nearest_lists(F.col("qvec"), nprobe), lambda s: s["list_id"]
        ))
    )
    scored = (
        assigned.join(
            F.broadcast(q), assigned.list_id == q.probe
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qvec"), F.col("cvec"), dim)
                / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: signed-random-projection buckets, then
    exact rerank WITHIN the query's bucket. Scale: the candidate join is
    an equi-join on bucket id (shuffle-hash/broadcast, Catalyst picks),
    touching ~corpus/2^n_planes rows per query instead of the corpus."""
    planes = random_hyperplanes(dim, n_planes)
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col), dim).alias("cn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col), dim).alias("qn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qvec"), F.col("cvec"), dim)
                / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
