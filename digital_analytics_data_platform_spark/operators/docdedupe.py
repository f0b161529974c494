"""Document deduplication families for training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB: every family is (cheap per-row signature) →
(bucket/group shuffle on the signature) → (verify only within buckets).
No all-pairs comparison ever leaves a bucket; signatures are built-in
column expressions (xxhash64 / aggregate / transform), so the hot path
stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, normalize_text, shingles


# ---------------------------------------------------------------- exact

def dedupe_exact(df: DataFrame, text_col: str = "text", *, id_col: str = "doc_id") -> DataFrame:
    """Exact (normalized) dedup: hash-groupBy on the content
    fingerprint, keep the smallest id per group (deterministic)."""
    return (
        df.withColumn("_fp", fingerprint(text_col))
        .groupBy("_fp")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_w"), F.count(F.lit(1)).alias("dup_count"))
        .select(F.col("_w.*"), "dup_count")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate-group detection (A7 analog at corpus scale):
    fingerprint groups with >1 member."""
    return (
        df.groupBy(fingerprint(text_col).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------- minhash

def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signatures as (id, _sig array<long>).

    Row-explode formulation: shingles become rows, then ONE hash
    aggregation computes all ``num_hashes`` minima per document
    (``min(xxhash64(shingle, i))`` × i). This keeps every expression
    tiny (codegen-friendly) and is the shape that scales — the naive
    nested ``array_min(transform(...))`` per hash function duplicates
    the whole shingle expression tree num_hashes × bands times and
    blows up both Catalyst and codegen (measured 138s → <2s on 500
    docs)."""
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("_sh")
    )
    aggs = [F.min(F.xxhash64("_sh", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)]
    per_doc = sh.groupBy("_id").agg(*aggs)
    return per_doc.select("_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH:
    signature → band keys → self-join within band buckets only.
    Returns distinct (a, b) pairs with a < b plus estimated Jaccard
    (fraction of matching minhash components)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        df, id_col=id_col, text_col=text_col, num_hashes=num_hashes, shingle_k=shingle_k
    )
    band_keys = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[F.element_at("_sig", b * rows_per_band + r + 1).cast("string") for r in range(rows_per_band)],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select("_id", "_sig", F.col("_bk.band").alias("band"), F.col("_bk.bucket").alias("bucket"))

    left = band_keys.select(F.col("band"), F.col("bucket"), F.col("_id").alias("a"), F.col("_sig").alias("sig_a"))
    right = band_keys.select(F.col("band"), F.col("bucket"), F.col("_id").alias("b"), F.col("_sig").alias("sig_b"))
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .groupBy("a", "b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )
    return pairs


def dedupe_minhash(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kw,
) -> DataFrame:
    """Drop near-duplicates: for each candidate pair above threshold,
    keep the smaller id (greedy canonical representative — one
    left_anti join, no iterative connected components; documents whose
    every duplicate-partner has a smaller id are dropped)."""
    pairs = minhash_lsh_pairs(df, id_col=id_col, text_col=text_col, **lsh_kw).filter(
        F.col("est_jaccard") >= threshold
    )
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def minhash_portable_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Portable MinHash+LSH pairs — identical in any engine with md5().

    Signature component i = min over distinct shingles of
    ``md5(f"{i}:" + shingle)``: a lexicographic min over lowercase hex
    strings, which every engine orders identically. The band bucket is
    the concatenated signature slice itself (no engine-specific hash in
    the key). Exists so the approximate-dedup family has an exactly
    oracle-checkable member (DuckDB replica ``queries.SQL_MINHASH_PORTABLE``
    computes the same signatures bit-for-bit); the production-scale path
    is :func:`minhash_lsh_pairs`, whose xxhash64 components are 8-byte
    longs instead of 32-byte hex strings (4× narrower shuffle).
    Returns distinct (a, b, est_jaccard) with a < b.
    """
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("_sh")
    )
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("_sh")))).alias(f"_h{i}") for i in range(num_hashes)]
    sig = (
        sh.groupBy("_id")
        .agg(*aggs)
        .select("_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig"))
    )
    band_keys = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[F.element_at("_sig", b * rows_per_band + r + 1) for r in range(rows_per_band)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select("_id", "_sig", F.col("_bk.band").alias("band"), F.col("_bk.bucket").alias("bucket"))
    left = band_keys.select("band", "bucket", F.col("_id").alias("a"), F.col("_sig").alias("sig_a"))
    right = band_keys.select("band", "bucket", F.col("_id").alias("b"), F.col("_sig").alias("sig_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .groupBy("a", "b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


# --------------------------------------------------------------- simhash

def simhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    shingle_k: int = 2,
    hash_fn=None,
) -> DataFrame:
    """SimHash per document as (id, _sh long): per bit, sign of the sum
    over shingles of ±1 given by that bit of the per-shingle hash
    (default xxhash64; ``hash_fn(shingle_col) -> long Column`` swaps in
    a portable hash, see :func:`simhash_portable_near_dups`).
    Row-explode + one aggregation with ``bits`` small sum expressions
    (same codegen rationale as :func:`minhash_signatures`)."""
    hash_fn = hash_fn or F.xxhash64
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles(text_col, shingle_k)).alias("_s")
    ).withColumn("_h", hash_fn(F.col("_s")))
    aggs = [
        F.sum(
            F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    per_doc = sh.groupBy("_id").agg(*aggs)
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(F.col(f"_b{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return per_doc.select("_id", out.alias("_sh"))


def _simhash_band_verify(sig: DataFrame, *, bits: int, max_hamming: int) -> DataFrame:
    """Pigeonhole blocking + within-block verify shared by every SimHash
    variant: partition the ``bits`` signature bits into
    ``min(max_hamming+1, bits)`` disjoint bands (the LAST band absorbs
    the remainder so the partition covers ALL bits — a band shifted past
    the signature would give every doc key 0 and make that band's join
    quadratic), join on (band, key), verify hamming ≤ ``max_hamming``
    inside blocks only. Distance ≤ k with k+1 covering bands ⇒ some
    band matches exactly, so recall is 1.0 by construction. That
    guarantee needs max_hamming + 1 ≤ bits (otherwise a pair may differ
    in every band) — a degenerate config, rejected loudly rather than
    silently losing recall."""
    if max_hamming >= bits:
        raise ValueError(
            f"max_hamming={max_hamming} >= bits={bits}: pigeonhole blocking "
            "cannot guarantee recall (need max_hamming + 1 covering bands); "
            "raise bits or lower max_hamming"
        )
    n_bands = min(max_hamming + 1, bits)
    band_bits = max(1, bits // n_bands)
    bandkeys = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("_sh", b * band_bits)
                        .bitwiseAND(
                            F.lit(
                                (1 << (band_bits if b < n_bands - 1 else bits - b * band_bits)) - 1
                            )
                        )
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_bk"),
    ).select("_id", "_sh", F.col("_bk.band").alias("band"), F.col("_bk.key").alias("key"))
    l = bandkeys.select("band", "key", F.col("_id").alias("a"), F.col("_sh").alias("sh_a"))
    r = bandkeys.select("band", "key", F.col("_id").alias("b"), F.col("_sh").alias("sh_b"))
    return (
        l.join(r, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("a", "b")
        .agg(F.min("hamming").alias("hamming"))
    )


def simhash_near_dups(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", bits: int = 16, max_hamming: int = 2
) -> DataFrame:
    """Near-dup pairs under Hamming distance on SimHash. Scale path:
    block on bit-bands (pigeonhole: distance ≤ k → some band of k+1
    matches exactly), verify hamming within blocks only
    (:func:`_simhash_band_verify`)."""
    sig = simhash_signatures(df, id_col=id_col, text_col=text_col, bits=bits)
    return _simhash_band_verify(sig, bits=bits, max_hamming=max_hamming)


def simhash_portable_near_dups(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 2,
    shingle_k: int = 2,
) -> DataFrame:
    """Portable SimHash near-dups — the exactly-oracle-checked member of
    the SimHash family (companion to :func:`minhash_portable_pairs`).

    The per-shingle hash is the first ``bits`` bits of the md5 hex
    digest (hex→int via ``conv``), so every engine with ``md5()``
    reproduces the signatures bit-for-bit; the DuckDB replica
    (``queries.SQL_SIMHASH_PORTABLE``) verifies blocking AND hamming,
    not just row counts. Same plan shape as :func:`simhash_near_dups`
    (signature agg → pigeonhole bit-band blocks → verify within
    blocks; the last band absorbs the remainder bits so the partition
    covers all ``bits``); the production path keeps xxhash64 (one
    8-byte hash vs md5's 16 bytes + hex decode). Returns distinct
    (a, b, hamming int) with a < b and hamming ≤ ``max_hamming``.
    """
    # conv(hex,16,10).cast('long') overflows to null at ≥64 bits (and
    # flips sign semantics near 63): cap the portable variant at 60
    # bits (15 hex chars, always positive) so bad configs fail loudly
    # instead of producing null per-shingle hashes
    if not 1 <= bits <= 60:
        raise ValueError(f"bits={bits}: portable md5 signatures support 1..60 bits")

    def md5_bits(col):
        return F.conv(F.substring(F.md5(col), 1, (bits + 3) // 4), 16, 10).cast("long")

    sig = simhash_signatures(
        df, id_col=id_col, text_col=text_col, bits=bits, shingle_k=shingle_k, hash_fn=md5_bits
    )
    return _simhash_band_verify(sig, bits=bits, max_hamming=max_hamming)


# --------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard via shingle inverted index: explode
    shingles, self-join on shingle (co-occurrence counts), then
    |A∩B| / (|A|+|B|−|A∩B|). The shuffle key is the shingle, so common
    shingles dominate cost — at corpus scale set ``max_shingle_df`` to
    drop shingles appearing in more than that many documents before the
    self-join (stopword-shingle pruning). Pruned shingles are excluded
    from the intersection but kept in the set sizes, so the reported
    jaccard is a lower bound — pairs held together only by boilerplate
    shingles are (deliberately) no longer near-dups."""
    docs = df.select(F.col(id_col).alias("_id"), shingles(text_col, shingle_k).alias("_sh"))
    sizes = docs.select("_id", F.size(F.array_distinct("_sh")).alias("_n"))
    inv = docs.select("_id", F.explode(F.array_distinct("_sh")).alias("shingle"))
    if max_shingle_df is not None:
        rare = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        inv = inv.join(rare, "shingle", "left_semi")
    co = (
        inv.alias("x")
        .join(inv.alias("y"), "shingle")
        .filter(F.col("x._id") < F.col("y._id"))
        .groupBy(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        co.join(sizes.withColumnsRenamed({"_id": "a", "_n": "na"}), "a")
        .join(sizes.withColumnsRenamed({"_id": "b", "_n": "nb"}), "b")
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
