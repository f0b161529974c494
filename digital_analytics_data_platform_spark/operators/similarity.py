"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one broadcast of the query
set, cosine via an Arrow-vectorized pandas UDF (each batch becomes a
numpy matrix; the dot products are one BLAS call — this beats Spark's
higher-order array functions, which are evaluated interpreted per
element, by orders of magnitude and is exactly the "vectorized
pandas/Arrow UDFs, no per-row Python" contract from BASELINE.json).
Scale path: LSH-bucketed ANN (random-hyperplane signs) — candidates
share a bucket, exact cosine rerank within buckets; recall grows with
the number of independent tables while cost stays candidates-only
(never all-pairs). An IVF variant (k-means coarse quantizer) is the
natural next step but needs an iterative trainer; the LSH path covers
the ANN contract without per-row Python.

Reference analog: the AI-extraction workflow's page-level embedding
lookups (``workflows/01_competitive_offers_ai_extraction/notebooks/
01_Notebook_v8.ipynb``) generalized to corpus scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _mat(s: pd.Series):
    """Arrow list column → 2-D float64 numpy matrix (one conversion per
    batch, then everything is BLAS)."""
    import numpy as np

    if len(s) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    # np.stack over the object ndarray is a single C-level copy when the
    # elements are numpy arrays (the Arrow→pandas representation); the
    # per-row asarray list-comp it replaces was ~70x slower at 200k rows.
    return np.stack(s.to_numpy()).astype(np.float64, copy=False)


def _valid_mask(a: pd.Series, b: pd.Series):
    """Rows where both vectors are present (Arrow hands NULL list
    elements to pandas as None). Vectorized: ``Series.isna`` is a
    C-level scan — no Python-per-row generator in the batch loop."""
    return (~(a.isna() | b.isna())).to_numpy()


def _masked_series(vals, valid):
    """Full-length nullable-Float64 Series: positions outside ``valid``
    and NaN results inside it become true SQL NULLs through Arrow.
    Built via ``FloatingArray(values, mask)`` — one vectorized masked
    construction, no per-element Python (the round-2 list-comp variant
    was ~30x slower)."""
    import numpy as np

    out = np.full(len(valid), np.nan, dtype=np.float64)
    out[valid] = vals
    return pd.Series(pd.arrays.FloatingArray(out, np.isnan(out)))


def _cosine_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cosine similarity; NULL (not NaN) for null inputs and zero-norm
    vectors — Spark orders NaN above every double, so a NaN here would
    make degenerate vectors rank first in desc top-k windows and pass
    ``>= threshold`` filters. Nullable Float64 + masked construction
    round-trips to a true SQL NULL through Arrow."""
    import numpy as np

    valid = _valid_mask(a, b)
    if not valid.any():
        return _masked_series(np.zeros(0), valid)
    A, B = _mat(a[valid]), _mat(b[valid])
    num = (A * B).sum(axis=1)
    den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
    vals = np.where(den > 0, num / np.where(den == 0, 1.0, den), np.nan)
    return _masked_series(vals, valid)


def _dot_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    import numpy as np

    valid = _valid_mask(a, b)
    if not valid.any():
        return _masked_series(np.zeros(0), valid)
    A, B = _mat(a[valid]), _mat(b[valid])
    return _masked_series((A * B).sum(axis=1), valid)


# pandas_udf parses the return-type DDL against the active session, so
# construct lazily (module import must not require a SparkContext).
_UDF_CACHE: dict = {}


def _udf(name: str, fn, rtype: str):
    if name not in _UDF_CACHE:
        _UDF_CACHE[name] = pandas_udf(rtype)(fn)
    return _UDF_CACHE[name]


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _udf("dot", _dot_fn, "double")(a, b)


def l2_norm(a: Column | str) -> Column:
    """Pure column expression (kept codegen'd — it's cheap and used in
    projections where a UDF would force an exchange of the array)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _udf("cosine", _cosine_fn, "double")(a, b)


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
    # the scan's split count must not bound the O(|corpus|·|queries|)
    # kernel: a small-file corpus reads as ONE split, pinning the whole
    # cosine compute to one core. Round-robin repartition costs O(n)
    # bytes against O(n·q) compute — negligible, and at real corpus
    # sizes the scan is already this wide.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    scored = corpus.repartition(par).crossJoin(F.broadcast(q)).select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col),
        cosine(vec_col, "_qvec").alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_bucket_udf(n_planes: int = 12, seed: int = 42):
    """Random-hyperplane LSH bucket id as an Arrow-vectorized UDF: sign
    bits of vec @ H where H is a deterministic Gaussian plane matrix
    derived from (seed, dim) — no stored model, identical buckets on
    every executor and every run (replay determinism)."""

    def bucket_fn(v: pd.Series) -> pd.Series:
        import numpy as np

        A = _mat(v)
        if A.shape[0] == 0:
            return pd.Series([], dtype="int64")
        rng = np.random.RandomState((seed * 1_000_003 + A.shape[1]) % (2**31 - 1))
        H = rng.standard_normal((A.shape[1], n_planes))
        bits = (A @ H > 0).astype(np.int64)
        weights = np.left_shift(np.int64(1), np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return _udf(f"hyperplane_{n_planes}_{seed}", bucket_fn, "long")


def hyperplane_bucket(vec_col: str, *, n_planes: int = 12, seed: int = 42) -> Column:
    return hyperplane_bucket_udf(n_planes=n_planes, seed=seed)(F.col(vec_col))


def _with_buckets(df: DataFrame, idc: str, vec_col: str, n_planes: int, n_tables: int, seed: int) -> DataFrame:
    """Attach (tbl, bucket) per table; one UDF call per table (each a
    single matrix multiply per Arrow batch), then explode."""
    b = df.select(
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
    )
    return b.select(idc, vec_col, F.col("_b.tbl").alias("tbl"), F.col("_b.bucket").alias("bucket"))


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
    candidates. At 100 TB this is the only viable shape: the join is a
    shuffle on (tbl, bucket) and never materializes all pairs."""
    c = _with_buckets(corpus, id_col, vec_col, n_planes, n_tables, seed)
    q = _with_buckets(queries, query_id_col, vec_col, n_planes, n_tables, seed).withColumnRenamed(
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


def _portable_buckets(
    df: DataFrame, idc: str, vec_col: str, dim: int, n_planes: int, n_tables: int, quant: int
) -> DataFrame:
    """(tbl, bucket) rows per vector under md5-Rademacher sign
    projections — INT64 end to end: floor-quantize the float64-cast
    coordinates, integer einsum against the ±1 tensor, sign bits. No
    float summation order anywhere, so every engine computes the SAME
    buckets (the exactness the portable ANN/near-dup oracles rely on).
    One Arrow-batched einsum per batch."""
    import hashlib

    import numpy as np

    def rad(t: int, p: int, d: int) -> int:
        return 1 if int(hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()[:8], 16) % 2 else -1

    R = np.array(
        [[[rad(t, p, d) for d in range(dim)] for p in range(n_planes)] for t in range(n_tables)],
        dtype=np.int64,
    )
    shifts = (np.int64(1) << np.arange(n_planes, dtype=np.int64))[None, None, :]

    def _buckets_fn(s):
        import pandas as pd

        valid = ~s.isna()
        M = (
            np.stack([np.asarray(v, dtype=np.float64) for v in s[valid]])
            if valid.any()
            else np.zeros((0, dim))
        )
        Q = np.floor(M * float(quant)).astype(np.int64)
        dots = np.einsum("nd,tpd->ntp", Q, R)
        buckets = ((dots > 0).astype(np.int64) * shifts).sum(axis=2)  # (n, n_tables)
        out = pd.Series([None] * len(s), dtype=object)
        out[np.flatnonzero(valid.to_numpy())] = list(buckets)
        return out

    bucket_udf = pandas_udf("array<long>")(_buckets_fn)
    return df.select(idc, vec_col, F.posexplode(bucket_udf(F.col(vec_col))).alias("tbl", "bucket"))


def embedding_near_dups_portable(
    df: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 4,
    quant: int = 1000,
) -> DataFrame:
    """Embedding near-dup pairs with engine-exact candidate generation
    (the oracle-checked sibling of :func:`embedding_near_dups`): bucket
    by :func:`_portable_buckets`, verify exact cosine within shared
    buckets only. Returns distinct (a, b, cosine) with a < b."""
    b = _portable_buckets(df, id_col, vec_col, dim, n_planes, n_tables, quant)
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


def lsh_ann_portable_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 2,
    quant: int = 1000,
) -> DataFrame:
    """Portable LSH ANN — the exactly-oracle-checked member of the ANN
    family (companion to the portable MinHash/SimHash variants).

    Why it reproduces bit-for-bit in any engine: the hyperplanes are
    Rademacher (±1) vectors derived from md5 parity of ``"t:p:d"``, and
    the projected values are INTEGER dot products over
    ``floor(float64(v)·quant)``-quantized coordinates — no float
    summation order anywhere in the bucketing, so the candidate sets
    are engine-exact (DuckDB replica: ``queries.SQL_LSH_ANN_PORTABLE``).
    The rerank inside buckets is exact cosine, same tie-break as the
    brute-force oracle baseline. The production path is
    :func:`lsh_ann_topk` (float hyperplanes, one matrix multiply per
    Arrow batch); this variant trades that for cross-engine
    determinism — same plan shape: per-row signature, shuffle on
    (tbl, bucket), rerank only within buckets, never all-pairs.
    """
    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        return _portable_buckets(df, idc, vec_col, dim, n_planes, n_tables, quant)

    c = with_buckets(corpus, id_col)
    q = with_buckets(queries, query_id_col).withColumnRenamed(vec_col, "_qvec")
    cands = (
        c.join(q, ["tbl", "bucket"])
        .select(query_id_col, id_col, cosine(vec_col, "_qvec").alias("cosine"))
        .groupBy(query_id_col, id_col)
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_train(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_iters: int = 5,
    seed: int = 42,
    sample_per_cluster: int = 256,
):
    """Train an IVF coarse quantizer (Lloyd's k-means) distributed:
    assignment is one Arrow-batch matrix multiply per partition (pandas
    UDF with the centroid matrix in the closure), the centroid update is
    ``posexplode → groupBy(cluster, dim) → avg`` — only k×dim floats
    ever reach the driver per iteration. Deterministic init: the k
    vectors with the smallest ``xxhash64(vec)`` (seeded), i.e. a seeded
    uniform sample without an RNG on executors.

    Returns the centroid matrix as a list of lists (JSON-serializable
    model, same quantizer on every executor/run)."""
    import numpy as np

    init = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)).alias("_h"))
        .orderBy("_h")
        .limit(n_clusters)
        .collect()
    )
    centroids = np.asarray([list(r["v"]) for r in init], dtype=np.float64)

    for _ in range(n_iters):
        assign = _ivf_assign_udf(centroids)
        assigned = df.select(F.col(vec_col).alias("v"), assign(F.col(vec_col)).alias("c"))
        sums = (
            assigned.select("c", F.posexplode("v").alias("d", "x"))
            .groupBy("c", "d")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        counts = np.zeros(len(centroids))
        for r in sums:
            new[r["c"], r["d"]] = r["s"] / r["n"]
            counts[r["c"]] = r["n"]
        # empty clusters keep their old centroid
        centroids = new
    return [[float(x) for x in row] for row in centroids]


def _ivf_assign_udf(centroids, nprobe: int = 1):
    """Nearest-centroid assignment by cosine; ``nprobe > 1`` explodes to
    the top-n probe clusters (query-side fan-out)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    if nprobe == 1:
        def assign(v: pd.Series) -> pd.Series:
            A = _mat(v)
            if A.shape[0] == 0:
                return pd.Series([], dtype="int32")
            An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
            return pd.Series((An @ Cn.T).argmax(axis=1).astype("int32"))

        return pandas_udf("int")(assign)

    def probe(v: pd.Series) -> pd.Series:
        A = _mat(v)
        if A.shape[0] == 0:
            return pd.Series([], dtype="object")
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        sims = An @ Cn.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype("int32")
        return pd.Series([list(row) for row in top])

    return pandas_udf("array<int>")(probe)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    *,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: corpus partitioned by nearest centroid (the inverted
    file), queries probe their ``nprobe`` closest cells, exact cosine
    rerank within probed cells. The join shuffles on the cell id — like
    LSH, all-pairs never materializes; unlike LSH, cells adapt to the
    data distribution."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col), _ivf_assign_udf(centroids)(F.col(vec_col)).alias("cell")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(_ivf_assign_udf(centroids, nprobe=nprobe)(F.col(vec_col))).alias("cell"),
    )
    cands = (
        c.join(q, "cell")
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
    shared bucket with cosine above threshold. Self-join shuffles on
    (tbl, bucket) only — the all-pairs explosion never happens."""
    b = _with_buckets(df, id_col, vec_col, n_planes, n_tables, seed)
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
