"""Operator library correctness on small inputs (the DuckDB-oracle
checks at sf0.01 run via __spark_entry__; these are unit-grain)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from digital_analytics_data_platform_spark.operators import (
    asof_join,
    dedupe_lww,
    dedupe_lww_salted,
    dedupe_lww_window,
)
from digital_analytics_data_platform_spark.operators.calendar import qgp_calendar, qgp_week
from digital_analytics_data_platform_spark.operators.docdedupe import (
    dedupe_exact,
    dedupe_minhash,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from digital_analytics_data_platform_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)
from digital_analytics_data_platform_spark.operators.reshape import (
    date_spine,
    explode_date_range,
    pivot_agg,
    spine_join,
    unpivot,
)
from digital_analytics_data_platform_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_dups,
    lsh_ann_topk,
)
from digital_analytics_data_platform_spark.operators.text import (
    language_id,
    quality_score,
    token_count,
    shingles,
)


@pytest.fixture(scope="module")
def dup_df(spark):
    rows = [
        Row(k="a", ts=1, lsn=1, v="a1"),
        Row(k="a", ts=3, lsn=2, v="a3"),
        Row(k="a", ts=3, lsn=2, v="a3"),  # exact dup
        Row(k="a", ts=2, lsn=3, v="a2-late"),  # later lsn, older ts → loses
        Row(k="b", ts=1, lsn=4, v="b1"),
    ]
    return spark.createDataFrame(rows)


def test_dedupe_variants_agree(spark, dup_df):
    for fn in (dedupe_lww, dedupe_lww_window, dedupe_lww_salted):
        got = {r["k"]: r["v"] for r in fn(dup_df, ["k"], ["ts", "lsn"]).collect()}
        assert got == {"a": "a3", "b": "b1"}, fn.__name__


def test_asof_join_matches_naive(spark):
    import duckdb

    facts = spark.createDataFrame(
        [Row(k="x", d=i) for i in range(0, 20, 2)] + [Row(k="y", d=i) for i in range(1, 15, 3)]
    )
    snaps = spark.createDataFrame(
        [
            Row(k="x", sd=0, name="x0"),
            Row(k="x", sd=7, name="x7"),
            Row(k="x", sd=14, name="x14"),
            Row(k="y", sd=5, name="y5"),
        ]
    )
    got = asof_join(facts, snaps, ["k"], "d", "sd").orderBy("k", "d").toPandas()
    con = duckdb.connect()
    con.register("facts_pd", facts.toPandas())
    con.register("snaps_pd", snaps.toPandas())
    exp = con.sql(
        """
        SELECT f.k, f.d, s.name FROM facts_pd f LEFT JOIN snaps_pd s
        ON s.k = f.k AND s.sd = (SELECT max(sd) FROM snaps_pd s2 WHERE s2.k=f.k AND s2.sd <= f.d)
        ORDER BY f.k, f.d
        """
    ).df()
    assert got["name"].fillna("∅").tolist() == exp["name"].fillna("∅").tolist()


def test_unpivot_pivot_roundtrip(spark):
    wide = spark.createDataFrame(
        [Row(k="a", m1=1.0, m2=2.0), Row(k="b", m1=3.0, m2=None)]
    )
    long = unpivot(wide, ["k"], ["m1", "m2"])
    assert long.count() == 3  # EXCLUDE NULLS
    back = pivot_agg(long, ["k"], "metric_name", "metric_value", pivot_values=["m1", "m2"])
    got = {r["k"]: (r["m1"], r["m2"]) for r in back.collect()}
    assert got == {"a": (1.0, 2.0), "b": (3.0, None)}


def test_spine_join_no_duplication(spark):
    a = spark.createDataFrame([Row(k="x", va=1.0), Row(k="x", va=2.0)])  # dup grain!
    b = spark.createDataFrame([Row(k="y", vb=5.0)])
    out = spine_join({"a": a, "b": b}, ["k"])
    assert out.count() == 2  # spine keys only, pre-aggregated


def test_date_spine_and_explode(spark):
    assert date_spine(spark, "2026-01-01", "2026-01-10").count() == 10
    df = spark.sql("SELECT to_date('2026-01-01') s, to_date('2026-01-03') e")
    assert explode_date_range(df, "s", "e").count() == 3


def test_qgp_week_caps_at_quarter_end(spark):
    df = spark.sql(
        "SELECT d, cast(null as date) x FROM (VALUES (to_date('2026-03-30')), (to_date('2026-01-05')), (to_date('2026-03-28'))) v(d)"
    ).select("d", qgp_week(F.col("d")).alias("w"))
    got = {str(r["d"]): str(r["w"]) for r in df.collect()}
    # 2026-03-30 is a Monday; next Saturday 2026-04-04 is past Q1 end → capped at 2026-03-31
    assert got["2026-03-30"] == "2026-03-31"
    # 2026-01-05 Monday → Saturday 2026-01-10
    assert got["2026-01-05"] == "2026-01-10"
    # 2026-03-28 is a Saturday → maps to itself
    assert got["2026-03-28"] == "2026-03-28"


def test_qgp_calendar_classification(spark):
    cal = qgp_calendar(spark, "2026-01-01", "2026-06-30")
    types = {r["week_type"] for r in cal.collect()}
    assert "NORMAL" in types and "BOUNDARY_STUB" in types
    stub = cal.filter("week_type='BOUNDARY_STUB'").collect()
    assert all(r["days_in_period"] < 7 for r in stub)


def test_qgp_calendar_prior_year_mapping(spark):
    """Prior-year pointer joins on (iso_week, iso_year-1, week_type)
    across a year boundary; stub weeks get NULL WoW and prior-year
    pointers (ref 00_sdi_vw_mfc_dim_qgp_calendar.sql:83-107)."""
    cal = qgp_calendar(spark, "2024-01-01", "2026-12-31")
    rows = {str(r["qgp_week"]): r for r in cal.collect()}
    # 2026-01-10 (Saturday, NORMAL, ISO 2026-W02) ↔ 2025-01-11 (ISO 2025-W02)
    r = rows["2026-01-10"]
    assert r["week_type"] == "NORMAL"
    assert str(r["prior_year_qgp_week"]) == "2025-01-11"
    # year-boundary week: first NORMAL Saturday of 2026 after the Q4'25 stub
    # stub weeks carry NULL pointers
    stubs = cal.filter("week_type = 'BOUNDARY_STUB'").collect()
    assert stubs and all(r["prior_week"] is None for r in stubs)
    assert all(r["prior_year_qgp_week"] is None for r in stubs)
    # BOUNDARY_FIRST prior_week skips the stub (lands on a NORMAL Saturday)
    firsts = cal.filter("week_type = 'BOUNDARY_FIRST' AND prior_week IS NOT NULL").collect()
    assert firsts
    for r in firsts:
        assert rows[str(r["prior_week"])]["week_type"] == "NORMAL"
    # every NORMAL week beyond the first year maps to a prior-year NORMAL week
    n26 = cal.filter("week_type = 'NORMAL' AND qgp_week >= '2026-02-01'").collect()
    assert n26 and all(r["prior_year_qgp_week"] is not None for r in n26)


def test_text_operators(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="The cat sat on the mat and it was happy."),
            Row(doc_id=2, text="Der Hund ist nicht auf der Couch und das ist gut."),
            Row(doc_id=3, text="!!! ??? ###"),
        ]
    )
    langs = {r["doc_id"]: r["lang"] for r in df.select("doc_id", language_id("text").alias("lang")).collect()}
    assert langs[1] == "en" and langs[2] == "de" and langs[3] == "und"
    toks = df.select(token_count("text").alias("n")).collect()
    assert toks[0]["n"] > 8
    scored = quality_score(df)
    scores = {r["doc_id"]: r["q_score"] for r in scored.collect()}
    assert scores[1] > scores[3]
    sh = df.select(shingles("text", 3).alias("s")).first()["s"]
    assert sh[0] == "the cat sat"


def test_exact_and_minhash_dedupe(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark partitions and shuffle behavior today"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base.upper()),  # exact dup after normalization
            Row(doc_id=3, text=near),  # near dup
            Row(doc_id=4, text=far),
        ]
    )
    ex = dedupe_exact(df)
    assert ex.count() == 3 and ex.filter("dup_count=2").first()["doc_id"] == 1

    pairs = minhash_lsh_pairs(df, num_hashes=64, bands=16)
    p = {(r["a"], r["b"]): r["est_jaccard"] for r in pairs.collect()}
    assert p[(1, 2)] == 1.0
    assert (1, 3) in p and p[(1, 3)] > 0.4
    assert (1, 4) not in p or p[(1, 4)] < 0.2

    kept = dedupe_minhash(df, threshold=0.9, num_hashes=64, bands=16)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 2 not in ids and 1 in ids and 4 in ids


def test_minhash_portable_matches_hashlib_reference(spark):
    """The portable MinHash signature must reproduce bit-for-bit outside
    Spark (that is the point of the operator — the DuckDB oracle relies
    on it). Recompute with re + hashlib and compare pair estimates."""
    import hashlib
    import re as _re

    from digital_analytics_data_platform_spark.operators.docdedupe import minhash_portable_pairs

    docs = {
        1: "The quick brown fox jumps over the lazy dog again and again in the yard",
        2: "the quick brown fox jumps over the SLEEPY dog again and again in the yard",
        3: "completely different content about spark partitions and shuffle behavior today",
        4: "the quick brown fox jumps over the lazy dog again and again in the yard!!",
    }
    H, B = 16, 4
    rows_per_band = H // B

    def norm(t):
        return _re.sub(r"\s+", " ", _re.sub(r"[^\w\s]", " ", t.lower())).strip()

    def sig(t):
        w = norm(t).split(" ")
        shs = {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))} if len(w) >= 3 else {" ".join(w)}
        return [min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in shs) for i in range(H)]

    sigs = {d: sig(t) for d, t in docs.items()}
    expected = {}
    for a in docs:
        for b in docs:
            if a >= b:
                continue
            banded = any(
                sigs[a][i * rows_per_band : (i + 1) * rows_per_band]
                == sigs[b][i * rows_per_band : (i + 1) * rows_per_band]
                for i in range(B)
            )
            if banded:
                expected[(a, b)] = sum(x == y for x, y in zip(sigs[a], sigs[b])) / H

    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs.items()])
    got = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in minhash_portable_pairs(df, num_hashes=H, bands=B).collect()
    }
    assert got == expected
    assert (1, 4) in got and got[(1, 4)] == 1.0  # punctuation-only difference
    assert (1, 2) in got  # near dup banded together


def test_simhash_and_ngram_jaccard(spark):
    base = "spark structured streaming applies micro batches to lake tables with merge semantics"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base.replace("lake", "delta")),
            Row(doc_id=3, text="unrelated words entirely: bananas oranges apples grapes melons pears"),
        ]
    )
    # short docs give noisy simhash: near pair ≈10 bits apart, unrelated ≈18+
    sh = {(r["a"], r["b"]) for r in simhash_near_dups(df, bits=32, max_hamming=12).collect()}
    assert (1, 2) in sh and (1, 3) not in sh and (2, 3) not in sh
    nj = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, min_jaccard=0.3).collect()}
    assert (1, 2) in nj and (1, 3) not in nj


def test_simhash_portable_matches_pure_python_model(spark):
    """The portable (md5-based) SimHash must agree with an independent
    pure-Python model of the same definition — the same cross-engine
    determinism the DuckDB oracle (SQL_SIMHASH_PORTABLE) relies on."""
    import hashlib
    import re

    from digital_analytics_data_platform_spark.operators.docdedupe import (
        simhash_portable_near_dups,
    )

    base = "spark structured streaming applies micro batches to lake tables with merge semantics"
    texts = {
        1: base,
        2: base.replace("lake", "delta"),
        3: "unrelated words entirely: bananas oranges apples grapes melons pears",
        4: base + "!!!",  # punctuation-only difference → identical shingles
    }
    bits, max_hamming, k = 16, 3, 2

    def model_sig(text):
        words = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", " ", text.lower(), flags=re.UNICODE)).strip().split(" ")
        shs = [" ".join(words)] if len(words) < k else [
            " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
        ]
        sums = [0] * bits
        for s in shs:
            h = int(hashlib.md5(s.encode()).hexdigest()[:4], 16)
            for b in range(bits):
                sums[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(bits) if sums[b] > 0)

    sigs = {i: model_sig(t) for i, t in texts.items()}
    expected = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in texts
        for b in texts
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= max_hamming
    }
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in texts.items()])
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_portable_near_dups(df, bits=bits, max_hamming=max_hamming, shingle_k=k).collect()
    }
    assert (1, 4) in got and got[(1, 4)] == 0  # punctuation-only → identical signature
    # bands partition all 16 bits, so pigeonhole guarantees EVERY pair
    # with hamming ≤ max_hamming is found: exact set equality
    assert got == expected


def test_corpus_prep_planted_docs(spark, tmp_path):
    """corpus_prep end-to-end over planted documents: the exact dup,
    the near dup, the non-English doc, the low-quality doc, and the
    too-short doc are all removed; the clean survivors carry
    lang/q_score/n_tokens."""
    from digital_analytics_data_platform_spark.queries import q_corpus_prep

    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows through the green valley and the morning light settles on the hills"
    )
    docs = [
        (1, base),
        (2, base + "!!!"),  # exact dup after normalization → dropped (keep 1)
        (3, base.replace("morning", "evening")),  # near dup → dropped (pairs with 1)
        (4, "der schnelle braune fuchs springt über den faulen hund und der ruhige "
            "fluss fließt durch das grüne tal während das licht auf die hügel fällt"),  # non-en
        (5, "x" * 400),  # degenerate quality → dropped
        (6, "a completely different english document about spark structured "
            "streaming applying micro batches to lake tables with merge semantics "
            "and watermarks for late arriving data in long running pipelines"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in q_corpus_prep(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 6}
    assert all(r["lang"] == "en" and r["q_score"] >= 0.5 and r["n_tokens"] >= 10 for r in out.values())


def test_similarity_brute_and_lsh(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 16).astype("float32")
    vecs[1] = vecs[0] + 0.01 * rng.randn(16).astype("float32")  # near-dup of 0
    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(60)]
    )
    queries = spark.createDataFrame([Row(query_id=0, embedding=[float(x) for x in vecs[0]])])
    bf = brute_force_topk(corpus, queries, k=3)
    top = [r["vec_id"] for r in bf.orderBy("rank").collect()]
    assert top[0] == 0 and top[1] == 1  # self, then the near-dup

    ann = lsh_ann_topk(corpus, queries, k=3, n_planes=6, n_tables=6)
    ann_ids = [r["vec_id"] for r in ann.orderBy("rank").collect()]
    assert 0 in ann_ids and 1 in ann_ids  # recall of the true near pair

    nd = embedding_near_dups(corpus, min_cosine=0.99, n_planes=6, n_tables=6)
    assert (0, 1) in {(r["a"], r["b"]) for r in nd.collect()}

    from digital_analytics_data_platform_spark.operators.similarity import ivf_ann_topk, ivf_train

    centroids = ivf_train(corpus, n_clusters=4, n_iters=3)
    assert len(centroids) == 4 and len(centroids[0]) == 16
    ivf = ivf_ann_topk(corpus, queries, centroids, k=3, nprobe=2)
    ivf_ids = [r["vec_id"] for r in ivf.orderBy("rank").collect()]
    assert 0 in ivf_ids and 1 in ivf_ids  # near-dup pair lands in the same cell


def test_lsh_ann_portable_matches_pure_python_model(spark):
    """Portable LSH ANN: the integer bucketing must agree with an
    independent pure-Python model (hashlib + int loops, no numpy), a
    planted near-dup must be retrieved at rank 2 behind self, and the
    result must be deterministic — the cross-engine exactness the
    DuckDB oracle (SQL_LSH_ANN_PORTABLE) relies on."""
    import hashlib
    import math

    import numpy as np

    from digital_analytics_data_platform_spark.operators.similarity import (
        lsh_ann_portable_topk,
    )

    dim, n_planes, n_tables, quant = 8, 6, 2, 1000
    rng = np.random.RandomState(3)
    vecs = rng.randn(40, dim).astype("float32")
    vecs[1] = vecs[0] + 0.001 * rng.randn(dim).astype("float32")

    def model_buckets(v):
        q = [math.floor(float(np.float64(x)) * quant) for x in v]
        out = []
        for t in range(n_tables):
            bucket = 0
            for p in range(n_planes):
                dot = 0
                for d in range(dim):
                    bit = int(hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()[:8], 16) % 2
                    dot += q[d] * (1 if bit else -1)
                if dot > 0:
                    bucket |= 1 << p
            out.append(bucket)
        return out

    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(40)]
    )
    queries = spark.createDataFrame([Row(query_id=0, embedding=[float(x) for x in vecs[0]])])
    got = lsh_ann_portable_topk(
        corpus, queries, dim=dim, k=3, n_planes=n_planes, n_tables=n_tables, quant=quant
    ).orderBy("rank")
    rows = got.collect()
    assert [r["vec_id"] for r in rows][:2] == [0, 1]  # self, then planted near-dup
    assert rows == got.collect()  # deterministic
    # candidate generation ≡ pure-python bucketing: every corpus vec
    # sharing a (table, bucket) with the query must appear as candidate
    qb = model_buckets(vecs[0])
    expected_cands = {
        i for i in range(40) if any(model_buckets(vecs[i])[t] == qb[t] for t in range(n_tables))
    }
    all_ranked = lsh_ann_portable_topk(
        corpus, queries, dim=dim, k=40, n_planes=n_planes, n_tables=n_tables, quant=quant
    ).collect()
    assert {r["vec_id"] for r in all_ranked} == expected_cands


def test_embedding_near_dups_portable_finds_planted_pair(spark):
    """Planted near-identical vectors must surface as a pair with
    cosine ≈ 1 through the portable (integer-bucketed) near-dup path,
    and every reported pair must clear the threshold."""
    import numpy as np

    from digital_analytics_data_platform_spark.operators.similarity import (
        embedding_near_dups_portable,
    )

    dim = 8
    rng = np.random.RandomState(5)
    vecs = rng.randn(50, dim).astype("float32")
    vecs[7] = vecs[3] + 0.001 * rng.randn(dim).astype("float32")
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(50)]
    )
    pairs = {
        (r["a"], r["b"]): r["cosine"]
        for r in embedding_near_dups_portable(df, dim=dim, min_cosine=0.9, n_planes=4, n_tables=4).collect()
    }
    assert (3, 7) in pairs and pairs[(3, 7)] > 0.999
    assert all(v >= 0.9 for v in pairs.values())


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 50)
    feats = extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 16 and r["n_bytes"] > 0 for r in rows)
    frames = sample_frames(media, every_ms=5000)
    assert frames.count() > 0
    # unknown codecs must refuse real decoding loudly
    from digital_analytics_data_platform_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def _ppm_bytes(w, h):
    import numpy as np

    px = (np.arange(h * w * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(h, w, 3)
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes(), px


def _bmp_bytes(px):
    """24-bit bottom-up BMP from uint8 (h,w,3) RGB."""
    import struct

    import numpy as np

    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def _wav_bytes(n=2000):
    import io
    import wave

    import numpy as np

    samples = (np.sin(np.linspace(0, 60, n)) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_multimodal_real_decode(spark):
    """Real (non-fake) decode path: PPM + BMP round-trip pixel-exact,
    WAV decodes via stdlib, features come from actual pixels/samples,
    resize produces the requested geometry."""
    import numpy as np
    from pyspark.sql import Row

    from digital_analytics_data_platform_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        image_features,
        resize_image,
        resize_images,
    )

    ppm, px = _ppm_bytes(8, 6)
    assert np.array_equal(decode_image(ppm), px)
    bmp = _bmp_bytes(px)
    assert np.array_equal(decode_image(bmp), px)
    wav, samples = _wav_bytes()
    assert np.array_equal(decode_audio(wav), samples)
    f = image_features(px)
    assert len(f) == 16 and abs(sum(f) - 1.0) < 1e-9
    small = resize_image(px, 4, 3)
    assert small.shape == (3, 4, 3)

    # end-to-end through Spark: real features + resize over mapInPandas
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", payload=bytearray(ppm), mime="image/x-portable-pixmap",
                width=8, height=6, duration_ms=None),
            Row(media_id=2, kind="image", payload=bytearray(bmp), mime="image/bmp",
                width=8, height=6, duration_ms=None),
            Row(media_id=3, kind="audio", payload=bytearray(wav), mime="audio/wav",
                width=None, height=None, duration_ms=125),
        ]
    )
    feats = {r["media_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    assert len(feats) == 3
    # PPM and BMP carry identical pixels → identical real features
    assert feats[1]["feature"] == feats[2]["feature"]
    assert abs(sum(feats[3]["feature"]) - 1.0) < 1e-6
    resized = resize_images(media.filter("kind = 'image'"), 4, 3).collect()
    assert all(r["payload"] is not None and r["width"] == 4 for r in resized)
    assert decode_image(bytes(resized[0]["payload"])).shape == (3, 4, 3)


def test_png_codec_roundtrip_and_spark_path(spark):
    """Real PNG decode (stdlib zlib + NumPy unfilter): pixel-exact
    round-trip across every scanline filter type and channel layout,
    CRC verification, and the same bytes flowing through the
    mapInPandas feature/resize stages."""
    import numpy as np
    from pyspark.sql import Row

    from digital_analytics_data_platform_spark.operators.multimodal import (
        decode_image,
        encode_png,
        resize_images,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(11, 13, 3), dtype=np.uint8)
    # every filter type exercised, incl. the sequential Average/Paeth rows
    for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
        assert np.array_equal(decode_image(encode_png(rgb, filters=filters)), rgb), filters

    gray = rng.randint(0, 256, size=(9, 5), dtype=np.uint8)
    out = decode_image(encode_png(gray, filters=(4, 2)))
    assert np.array_equal(out, np.repeat(gray[..., None], 3, axis=2))

    rgba = rng.randint(0, 256, size=(6, 7, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(rgba, filters=(1, 3))), rgba[..., :3])

    # corrupted chunk body must fail the CRC check, not decode garbage
    png = bytearray(encode_png(rgb))
    png[40] ^= 0xFF
    import pytest

    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(png))

    # same pixels as PNG and PPM → identical real features through Spark
    from digital_analytics_data_platform_spark.operators.multimodal import MEDIA_SCHEMA

    ppm, px = _ppm_bytes(8, 6)
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", payload=bytearray(encode_png(px, filters=(0, 1, 2, 3, 4))),
                mime="image/png", width=8, height=6, duration_ms=None),
            Row(media_id=2, kind="image", payload=bytearray(ppm), mime="image/x-portable-pixmap",
                width=8, height=6, duration_ms=None),
        ],
        MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    assert feats[1]["feature"] == feats[2]["feature"]
    resized = resize_images(media, 4, 3).collect()
    assert all(r["payload"] is not None for r in resized)


def test_png_codec_property_roundtrip():
    """Property: decode(encode(px, any filter schedule)) == px for
    arbitrary shapes and channel layouts (no Spark needed — pure
    codec)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from digital_analytics_data_platform_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    )
    def check(h, w, ch, seed, filters):
        rng = np.random.RandomState(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        got = decode_image(encode_png(px, filters=tuple(filters)))
        if ch == 1:
            exp = np.repeat(px[..., None], 3, axis=2)
        elif ch == 4:
            exp = px[..., :3]
        else:
            exp = px
        assert np.array_equal(got, exp)

    check()


def test_jpeg_codec_roundtrip_and_spark_path(spark):
    """Baseline JPEG codec (pure NumPy Huffman + DCT): near-lossless at
    high quality, DC-exact on solid blocks, bit-identical pixels with
    and without restart markers, 4:2:0 decode, and the bytes flowing
    through the real mapInPandas feature stage."""
    import numpy as np
    from pyspark.sql import Row

    from digital_analytics_data_platform_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from digital_analytics_data_platform_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
    )

    # solid color → zero AC energy → exact round-trip
    solid = np.full((16, 24, 3), [120, 60, 200], dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(solid, quality=90)), solid)

    rng = np.random.RandomState(7)
    g = np.meshgrid(np.linspace(0, 255, 40), np.linspace(0, 255, 32))
    img = np.clip(
        np.stack([g[0], g[1], np.full((32, 40), 128.0)], axis=-1) + rng.randn(32, 40, 3) * 8,
        0, 255,
    ).astype(np.uint8)

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255**2 / mse)

    d444 = decode_jpeg(encode_jpeg(img, quality=95))
    assert psnr(d444, img) > 30.0
    d420 = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert d420.shape == img.shape and psnr(d420, img) > 27.0
    # restart markers change the byte stream, not the decoded pixels
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=95, restart_interval=2)), d444)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=95, subsample=True, restart_interval=1)), d420
    )
    # non-multiple-of-8 dims and 2-D grayscale input
    odd = np.clip(rng.randn(13, 19, 3) * 40 + 128, 0, 255).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(odd, quality=90, subsample=True)).shape == (13, 19, 3)
    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)
    assert decode_jpeg(encode_jpeg(gray, quality=95)).shape == (8, 8, 3)
    # magic-byte dispatch through the shared decode entry point
    assert np.array_equal(decode_image(encode_jpeg(solid, quality=90)), solid)
    # progressive JPEG (SOF2) must refuse loudly, not decode garbage
    prog = bytearray(encode_jpeg(solid))
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(prog))

    # real features over mapInPandas from JPEG payloads
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", payload=bytearray(encode_jpeg(img, quality=95)),
                mime="image/jpeg", width=40, height=32, duration_ms=None),
            Row(media_id=2, kind="image", payload=bytearray(encode_jpeg(img, quality=95, restart_interval=2)),
                mime="image/jpeg", width=40, height=32, duration_ms=None),
        ],
        MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    # same pixels (restart markers are transparent) → identical features
    assert feats[1]["feature"] == feats[2]["feature"]


def test_jpeg_codec_property_roundtrip():
    """Property: baseline JPEG round-trip stays within a quantization-
    bounded error envelope for arbitrary smooth images, exact for
    per-8x8-block-constant images, across subsampling/restart
    settings (pure codec — no Spark)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from digital_analytics_data_platform_spark.operators.jpeg import decode_jpeg, encode_jpeg

    @settings(max_examples=20, deadline=None)
    @given(
        bh=st.integers(1, 3),
        bw=st.integers(1, 3),
        seed=st.integers(0, 2**31 - 1),
        subsample=st.booleans(),
        rst=st.sampled_from([0, 1, 3]),
    )
    def check(bh, bw, seed, subsample, rst):
        rng = np.random.RandomState(seed)
        # block-constant image: one flat color per 8x8 block (per 16x16
        # macroblock when subsampled, so chroma averaging is lossless)
        cell = 16 if subsample else 8
        base = rng.randint(16, 240, size=(bh, bw, 3), dtype=np.uint8)
        px = np.repeat(np.repeat(base, cell, axis=0), cell, axis=1)
        got = decode_jpeg(encode_jpeg(px, quality=92, subsample=subsample, restart_interval=rst))
        assert got.shape == px.shape
        # flat blocks carry only DC; error is bounded by DC quantization
        # + color-transform rounding
        assert np.abs(got.astype(int) - px.astype(int)).max() <= 24
        assert np.abs(got.astype(float) - px.astype(float)).mean() < 6.0

    check()


def test_jpeg_corrupt_inputs_raise_valueerror(spark):
    """Malformed payloads must surface as ValueError('corrupt JPEG …'),
    not IndexError/KeyError, so callers inside mapInPandas batch loops
    can distinguish bad data from codec bugs (ADVICE r3)."""
    import numpy as np
    import pytest as _pytest

    from digital_analytics_data_platform_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    good = encode_jpeg(px, quality=85)
    # truncated mid-entropy-data
    with _pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    # truncated inside a restart-interval stream
    good_rst = encode_jpeg(px, quality=85, restart_interval=1)
    with _pytest.raises(ValueError):
        decode_jpeg(good_rst[: len(good_rst) - 10])
    # not a JPEG at all
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    # SOI+EOI with no scan
    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_simhash_degenerate_configs_rejected(spark):
    """Pigeonhole recall guarantee needs max_hamming < bits; the
    portable md5 signatures support at most 60 bits (conv→long
    overflow). Both degenerate configs must fail loudly (ADVICE r3)."""
    import pytest as _pytest

    from digital_analytics_data_platform_spark.operators.docdedupe import (
        simhash_near_dups,
        simhash_portable_near_dups,
    )

    df = spark.createDataFrame([("d1", "a b c"), ("d2", "a b d")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(df, bits=8, max_hamming=8)
    with _pytest.raises(ValueError, match="60 bits"):
        simhash_portable_near_dups(df, bits=64, max_hamming=3)
