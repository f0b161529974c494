"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one broadcast of the query
set, dot products via ``zip_with``/``aggregate`` (codegen'd, no UDF).
Scale path: LSH-bucketed ANN (random-hyperplane signs) — candidates
share a bucket, exact rerank within buckets; probes in neighboring
bands trade recall for cost. An IVF variant (k-means coarse quantizer)
is the natural next step but needs an iterative trainer; the LSH path
covers the ANN contract without per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Queries are broadcast
    (they are the small side by construction); the corpus is scanned
    once; per-query ranking via window top-k."""
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col),
        cosine(vec_col, "_qvec").alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_bucket(vec_col: str, *, n_planes: int = 12, seed: int = 42, dim: int | None = None) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(vec, h_i) for
    deterministic pseudo-random hyperplanes h_i derived from
    xxhash64(i, j, seed) — no stored model, same bucket function on any
    executor."""
    v = F.col(vec_col)

    def plane_sign(i: int):
        # h_i[j] in {-1, +1} from hash of (plane, component); closure
        # factory keeps the lambda unary (a default arg would make
        # PySpark bind the array index over it)
        return lambda j: F.when(
            F.pmod(F.xxhash64(F.lit(i), j, F.lit(seed)), F.lit(2)) == 0, F.lit(-1.0)
        ).otherwise(F.lit(1.0))

    bits = []
    for i in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1), plane_sign(i)),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        bits.append(F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane tables,
    join corpus↔queries on (table, bucket), exact cosine rerank within
    candidates. Recall grows with n_tables; cost stays
    candidates-only (never all-pairs)."""
    def with_buckets(df, idc):
        return df.select(
            F.col(idc),
            F.col(vec_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            hyperplane_bucket(vec_col, n_planes=n_planes, seed=seed + 1000 * t).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("_b"),
        ).select(idc, vec_col, F.col("_b.tbl").alias("tbl"), F.col("_b.bucket").alias("bucket"))

    c = with_buckets(corpus, id_col)
    q = with_buckets(queries.withColumnRenamed(vec_col, vec_col), query_id_col).withColumnRenamed(
        vec_col, "_qvec"
    )
    cands = (
        c.join(q, ["tbl", "bucket"])
        .select(query_id_col, id_col, cosine(vec_col, "_qvec").alias("cosine"))
        .groupBy(query_id_col, id_col)
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH-bucketed): pairs in a
    shared bucket with cosine above threshold."""
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        hyperplane_bucket(vec_col, n_planes=n_planes, seed=seed + 1000 * t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("_b"),
    ).select(id_col, vec_col, F.col("_b.tbl").alias("tbl"), F.col("_b.bucket").alias("bucket"))
    l = b.select("tbl", "bucket", F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    r = b.select("tbl", "bucket", F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        l.join(r, ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
        .groupBy("a", "b")
        .agg(F.max("cosine").alias("cosine"))
    )
