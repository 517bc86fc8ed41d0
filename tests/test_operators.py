"""Data-pipeline operator tests: dedup finds planted duplicates, similarity
search returns the planted nearest neighbor, text analysis invariants,
multimodal Arrow plumbing, streaming equals batch."""

import pytest
from pyspark.sql import functions as F

from spark_ensemble_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from spark_ensemble_spark.operators.multimodal import (
    decode_stub_features,
    documents_as_binary,
)
from spark_ensemble_spark.operators.similarity import brute_force_topk, ivf_topk
from spark_ensemble_spark.operators.text import analyze_documents
from spark_ensemble_spark.sources.datasets import load_table
from spark_ensemble_spark.streaming.events import sessionize_batch


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100).cache()
    # plant near-duplicates: copy of doc text with one word appended
    dups = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    exact = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return docs.unionByName(dups).unionByName(exact).cache()


def test_exact_dedup(docs_with_dups):
    out = exact_dedup(docs_with_dups, ["text"], "doc_id")
    assert out.count() == 105  # 100 originals + 5 near-dups (not exact)
    # survivors are the min ids
    assert out.filter(F.col("doc_id") >= 200000).count() == 0


def test_lsh_hot_bucket_cap(spark):
    """A degenerate key (here: 40 identical boilerplate texts, which share
    every minhash band and every simhash chunk) must be QUARANTINED by the
    bucket cap — bounded candidate counts — while planted ordinary dups in
    the same corpus are still found (unchanged recall outside hot buckets)."""
    boiler = [(i, "lorem ipsum dolor sit amet " * 4) for i in range(40)]
    near = " ".join(f"word{i} common stable token" for i in range(12))
    normal = [
        (100, near + " ending alpha"),
        (101, near + " ending betaa"),
        (200, "completely unrelated text about distributed query engines at scale"),
    ]
    df = spark.createDataFrame(boiler + normal, "doc_id long, text string")

    pairs = minhash_dup_pairs(
        df, "text", "doc_id", threshold=0.5, num_hashes=64, bands=16,
        max_bucket_size=10,
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert not any(a < 40 and b < 40 for a, b in found)  # hot bucket quarantined
    assert (100, 101) in found  # ordinary near-dup recall unchanged

    sim = simhash_dup_pairs(df, "text", "doc_id", max_hamming=3, max_bucket_size=10)
    sfound = {(r.id_a, r.id_b) for r in sim.collect()}
    assert not any(a < 40 and b < 40 for a, b in sfound)
    assert (100, 101) in sfound

    # uncapped: the hot bucket squares into C(40,2) = 780 exact-dup pairs
    unc = minhash_dup_pairs(
        df, "text", "doc_id", threshold=0.5, num_hashes=64, bands=16,
        max_bucket_size=None,
    )
    assert unc.filter((F.col("id_a") < 40) & (F.col("id_b") < 40)).count() == 780


def test_priority_dedup_string_ids_and_null_priority(spark):
    # r4 ADVICE regression: the old max(struct(p, -id)) winner negated the id,
    # which NULLs out string ids (every duplicated group silently dropped) and
    # overflows Long.MIN_VALUE. Also: groups whose priority is entirely NULL
    # must survive, not vanish through a null-dropping equi-join.
    from spark_ensemble_spark.operators.dedup import exact_dedup_by_priority

    rows = [
        ("k1", "doc-b", 5),     # k1 winner: highest priority
        ("k1", "doc-a", 3),
        ("k1", "doc-c", 5),     # ties doc-b on priority; loses id tiebreak
        ("k2", "doc-z", None),  # all-NULL-priority group: keep min id
        ("k2", "doc-y", None),
        ("k3", "doc-solo", 1),  # singleton passes through
    ]
    df = spark.createDataFrame(rows, "key string, id string, priority int")
    kept = {r.id for r in exact_dedup_by_priority(df, ["key"], "id", "priority").collect()}
    assert kept == {"doc-b", "doc-y", "doc-solo"}


def test_priority_dedup_long_min_value(spark):
    from spark_ensemble_spark.operators.dedup import exact_dedup_by_priority

    rows = [("k", -(1 << 63), 1), ("k", 7, 1)]
    df = spark.createDataFrame(rows, "key string, id long, priority int")
    kept = [r.id for r in exact_dedup_by_priority(df, ["key"], "id", "priority").collect()]
    assert kept == [-(1 << 63)]  # min id wins the tie; no negation overflow


def test_minhash_finds_planted_near_dups(docs_with_dups):
    pairs = minhash_dup_pairs(
        docs_with_dups, "text", "doc_id", threshold=0.5, num_hashes=64, bands=16
    )
    found = {
        (r.id_a, r.id_b) for r in pairs.collect()
    }
    # exact copies must collide with certainty
    for i in range(3):
        assert (i, i + 200000) in found
    # appended-word near-dups should mostly be caught
    near = sum(1 for i in range(5) if (i, i + 100000) in found)
    assert near >= 4


def test_minhash_signature_shape(docs_with_dups):
    sigs = minhash_signatures(docs_with_dups, "text", "doc_id", num_hashes=32)
    row = sigs.first()
    assert len(row.signature) == 32


def test_simhash_finds_exact_dups(docs_with_dups):
    pairs = simhash_dup_pairs(docs_with_dups, "text", "doc_id", max_hamming=3)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    for i in range(3):
        assert (i, i + 200000) in found


def test_md5_hash_mode_matches_duckdb(spark):
    """The md5 hash mode exists so DuckDB can replay the whole MinHash/SimHash
    pipeline bit-for-bit; verify the signatures match on a tiny corpus (the
    registry gate re-checks the full pair output at every SF)."""
    import duckdb

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "short doc"),  # fewer tokens than shingle_size: try_element_at path
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {
        r.id: list(r.signature)
        for r in minhash_signatures(
            df, "text", "doc_id", num_hashes=8, seed=7, hash_fn="md5"
        ).collect()
    }
    from spark_ensemble_spark.operators.dedup import _MERSENNE, _minhash_coeffs

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    sig_elems = ", ".join(
        f"list_min(list_transform(h, x -> ((x % {_MERSENNE}) * {a} + {b}) % {_MERSENNE}))"
        for a, b in _minhash_coeffs(8, 7)
    )
    oracle = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id AS id,
                 string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
          FROM documents
        ), sh AS (
          SELECT id, list_transform(range(1, greatest(len(t) - 3, 0) + 2),
                 i -> ('0x' || substring(md5(concat_ws(' ', t[i+0], t[i+1], t[i+2])), 1, 15))::BIGINT) AS h
          FROM toks
        )
        SELECT id, [{sig_elems}] AS s FROM sh
        """
    ).fetchall()
    assert {i: list(s) for i, s in oracle} == sigs


def test_ngram_jaccard(docs_with_dups):
    pairs = ngram_jaccard_pairs(
        docs_with_dups, "text", "doc_id", n=2, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    for i in range(3):
        assert found.get((i, i + 200000)) == pytest.approx(1.0)


def test_brute_force_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    out = brute_force_topk(emb, q, k=3).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].cosine >= out[1].cosine >= out[2].cosine
    assert all(r.neighbor_id != 0 for r in out)


def test_ivf_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=1).collect()
    approx = ivf_topk(emb, q, k=1, num_clusters=8, nprobe=4).collect()
    exact_top = {r.query_id: r.neighbor_id for r in exact}
    approx_top = {r.query_id: r.neighbor_id for r in approx}
    hits = sum(1 for k, v in exact_top.items() if approx_top.get(k) == v)
    assert hits >= 6  # recall@1 >= 0.6 with nprobe=4/8


def test_srp_topk_recall(spark, sf_dir):
    """Multi-table SRP-LSH: planted exact duplicates are ALWAYS found (equal
    vectors share every bucket), and real top-1 recall on the near-random
    synthetic embeddings (hard case: moderate-similarity neighbors) has a
    stable deterministic floor."""
    from spark_ensemble_spark.operators.similarity import srp_topk

    emb = load_table(spark, sf_dir, "embeddings").cache()
    # planted exact copies: the copy's nearest neighbor is its original
    copies = emb.filter(F.col("vec_id") < 10).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    planted = emb.unionByName(copies)
    out = srp_topk(planted, copies, k=1, num_planes=8, num_tables=4, dim=64)
    top1 = {r.query_id: r.neighbor_id for r in out.collect()}
    assert all(top1[i + 1_000_000] == i for i in range(10)), top1

    q = emb.filter(F.col("vec_id") < 10)
    exact = {r.query_id: r.neighbor_id for r in brute_force_topk(emb, q, k=1).collect()}
    approx = {
        r.query_id: r.neighbor_id
        for r in srp_topk(emb, q, k=1, num_planes=8, num_tables=4, dim=64).collect()
    }
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    assert hits >= 4, f"recall@1 {hits}/10"


def test_embedding_dup_pairs_consistency(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200).cache()
    brute = embedding_dup_pairs(emb, "embedding", "vec_id", 0.8, brute_force=True)
    lsh = embedding_dup_pairs(emb, "embedding", "vec_id", 0.8, num_planes=4)
    b = {(r.id_a, r.id_b) for r in brute.collect()}
    l = {(r.id_a, r.id_b) for r in lsh.collect()}
    assert l <= b  # LSH candidates are a subset (verified exactly)


def test_text_analysis(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = analyze_documents(docs).cache()
    row = out.first()
    assert row.n_tokens > 0
    assert row.n_bpe_tokens >= row.n_tokens  # BPE splits are finer
    assert len(row.fingerprint) == 32
    assert 0.0 <= row.quality <= 1.0
    assert row.lang_pred in ("en", "de", "fr", "es", "zh")
    # fingerprint is whitespace-insensitive
    fp2 = analyze_documents(
        docs.withColumn("text", F.concat(F.lit("  "), F.col("text")))
    ).select("doc_id", "fingerprint")
    joined = out.select("doc_id", "fingerprint").join(
        fp2.withColumnRenamed("fingerprint", "fp2"), "doc_id"
    )
    assert joined.filter(F.col("fingerprint") != F.col("fp2")).count() == 0


def test_multimodal_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = decode_stub_features(documents_as_binary(docs))
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert r.n_bytes > 0 and 0 <= r.first_byte < 256 and r.byte_sum > 0


def test_multimodal_bmp_decode_roundtrip(spark, sf_dir):
    """Real BMP decode (r6 VERDICT #3 — stub retired): generated payloads
    are honest BMP bytes, and the decoder recovers dimensions, channel
    means, and the position-sensitive top-left probe from the BYTES."""
    from spark_ensemble_spark.operators.multimodal import (
        decode_image,
        synthetic_bmp_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = synthetic_bmp_corpus(docs, limit_ids=40)
    # payloads are real BMPs: magic, declared size, 54-byte headers
    for r in corpus.collect():
        assert r.payload[:2] == b"BM" and r.n_bytes == len(r.payload) >= 54
    out = {r.doc_id: r for r in decode_image(corpus).collect()}
    assert len(out) == 40
    for i, r in out.items():
        w, h = 4 + i % 5, 3 + i % 4
        assert (r.width, r.height) == (w, h)
        assert r.top_left_r == (i * 7) % 256
        exp_r = sum((i * 7 + x * 3 + y * 5) % 256 for x in range(w) for y in range(h)) / (w * h)
        assert r.mean_r == exp_r  # exact: integer sum / n in IEEE double


def test_multimodal_bmp_decode_topdown_and_errors(spark):
    """The decoder honors the header, not fixture conventions: a NEGATIVE
    height means top-down row order (no flip), and non-24bpp payloads fail
    loudly instead of returning garbage."""
    import struct

    from spark_ensemble_spark.operators.multimodal import decode_image

    w, h = 2, 2
    # top-down 2x2: rows stored first-row-first; pixel (0,0) = BGR (3,2,1)
    rows = bytes([3, 2, 1, 9, 8, 7, 0, 0]) + bytes([30, 20, 10, 90, 80, 70, 0, 0])
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    df = spark.createDataFrame([(1, header + rows)], "doc_id long, payload binary")
    r = decode_image(df).collect()[0]
    assert (r.width, r.height, r.top_left_r) == (2, 2, 1)
    assert r.mean_b == (3 + 9 + 30 + 90) / 4 and r.mean_r == (1 + 7 + 10 + 70) / 4

    bad = struct.pack("<2sIHHI", b"BM", 62, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 8, 2835, 2835, 0, 0
    ) + bytes(8)
    with pytest.raises(Exception, match="unsupported BMP"):
        decode_image(
            spark.createDataFrame([(1, bad)], "doc_id long, payload binary")
        ).collect()


def test_multimodal_png_decode_roundtrip(spark, sf_dir):
    """Real COMPRESSED decode (r7 VERDICT #3): generated payloads are honest
    PNGs — zlib-DEFLATEd IDAT, per-row filters cycling through all five
    types — and the stdlib-zlib + defilter decoder recovers dimensions,
    channel means, and the top-left probe from the BYTES. Unlike BMP, the
    pixel bytes appear nowhere in the payload verbatim."""
    from spark_ensemble_spark.operators.multimodal import (
        decode_png,
        synthetic_png_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = synthetic_png_corpus(docs, limit_ids=40)
    for r in corpus.collect():
        assert r.payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert r.n_bytes == len(r.payload)
    out = {r.doc_id: r for r in decode_png(corpus).collect()}
    assert len(out) == 40
    for i, r in out.items():
        w, h = 5 + i % 6, 4 + i % 5
        assert (r.width, r.height) == (w, h)
        assert r.top_left_r == (i * 7) % 256
        exp_g = sum(
            (i * 7 + x * 3 + y * 5 + 11) % 256 for x in range(w) for y in range(h)
        ) / (w * h)
        assert r.mean_g == exp_g  # exact: integer sum / n in IEEE double


def test_multimodal_png_decode_rejects_bad_payloads(spark):
    """Wrong magic and unsupported variants (16-bit, paletted) fail loudly
    instead of returning garbage."""
    import struct
    import zlib

    from spark_ensemble_spark.operators.multimodal import (
        _png_chunk,
        decode_png,
    )

    with pytest.raises(Exception, match="not a PNG"):
        decode_png(
            spark.createDataFrame([(1, b"JFIFxxxx")], "doc_id long, payload binary")
        ).collect()
    # grayscale 8-bit (color type 0) is a real PNG but outside this decoder
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x7f"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(Exception, match="unsupported PNG"):
        decode_png(
            spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
        ).collect()


def test_multimodal_wav_decode_roundtrip(spark, sf_dir):
    """Real WAV decode: generated payloads are honest RIFF containers and
    the chunk-walking parser recovers rate/channels/sample facts from the
    BYTES; an extra chunk before ``data`` must not break the walk."""
    import struct

    from spark_ensemble_spark.operators.multimodal import (
        decode_audio,
        synthetic_wav_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = synthetic_wav_corpus(docs, limit_ids=30)
    for r in corpus.collect():
        assert r.payload[:4] == b"RIFF" and r.payload[8:12] == b"WAVE"
    out = {r.doc_id: r for r in decode_audio(corpus).collect()}
    assert len(out) == 30
    for i, r in out.items():
        n = 64 + i % 33
        assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, n)
        samples = [((i * 31 + k * 17) % 65536) - 32768 for k in range(n)]
        assert r.max_amp == max(samples)
        assert r.mean_amp == sum(samples) / n

    # chunk walking: a LIST chunk between fmt and data must be skipped
    data = struct.pack("<4h", 100, -200, 300, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    r = decode_audio(
        spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    ).collect()[0]
    assert (r.sample_rate, r.n_samples, r.max_amp) == (16000, 4, 300)
    assert r.mean_amp == (100 - 200 + 300 - 32768) / 4


def test_multimodal_resize(spark, sf_dir):
    """Nearest-neighbor resize: sampled coordinates follow the box-origin
    mapping, resized facts match the closed form, and a degenerate resize
    target fails loudly."""
    from spark_ensemble_spark.operators.multimodal import (
        resize_image,
        synthetic_bmp_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = {r.doc_id: r for r in resize_image(
        synthetic_bmp_corpus(docs, limit_ids=25), out_w=3, out_h=2
    ).collect()}
    assert len(out) == 25
    for i, r in out.items():
        w, h = 4 + i % 5, 3 + i % 4
        xs = [(j * w) // 3 for j in range(3)]
        ys = [(k * h) // 2 for k in range(2)]
        exp = [
            (i * 7 + x * 3 + y * 5) % 256 for x in xs for y in ys
        ]
        assert (r.width, r.height) == (3, 2)
        assert r.mean_r == sum(exp) / 6
    with pytest.raises(ValueError, match="resize target"):
        resize_image(synthetic_bmp_corpus(docs, limit_ids=2), out_w=0)


def test_multimodal_frame_sample(spark, sf_dir):
    """Every-Nth-frame selection over raw multi-frame payloads: frame 0
    always kept, offsets exact, per-frame facts match the closed form."""
    from spark_ensemble_spark.operators.multimodal import (
        frame_sample,
        synthetic_video_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    vids = synthetic_video_corpus(docs, limit_ids=30)
    out = frame_sample(vids, every_n=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(30))
    for i, rows in by_doc.items():
        nf, fs = 8 + i % 5, 16 + i % 7
        assert sorted(r.frame_idx for r in rows) == list(range(0, nf, 4))
        for r in rows:
            assert r.n_bytes == fs
            assert r.first_byte == (i * 13 + r.frame_idx * 7) % 256
            assert r.byte_sum == sum(
                (i * 13 + r.frame_idx * 7 + j) % 256 for j in range(fs)
            )
    with pytest.raises(ValueError, match="every_n"):
        frame_sample(vids, every_n=0)


def test_streaming_equals_batch(spark, sf_dir):
    from spark_ensemble_spark.streaming.events import streaming_windowed_counts

    stream_out = streaming_windowed_counts(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .collect()
    )
    assert sorted(map(tuple, stream_out)) == sorted(map(tuple, batch))


def test_sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize_batch(ev, gap_minutes=30)
    total_events = sessions.agg(F.sum("n_events")).first()[0]
    assert total_events == ev.count()
    assert sessions.filter(F.col("n_events") < 1).count() == 0


def test_dup_clusters(spark):
    from spark_ensemble_spark.operators.dedup import dup_clusters

    # two components: {1,2,3,4} via a chain, {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    out = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dup_clusters_on_planted(docs_with_dups):
    from spark_ensemble_spark.operators.dedup import dup_clusters, minhash_dup_pairs

    pairs = minhash_dup_pairs(docs_with_dups, "text", "doc_id", threshold=0.5)
    clusters = dup_clusters(pairs)
    got = {r.id: r.cluster_id for r in clusters.collect()}
    # exact copies resolve to the original id as canonical representative
    for i in range(3):
        assert got.get(i + 200000) == i


def test_salted_join_hot_keys_matches_plain_join(spark):
    """Targeted hot-key salting is result-equivalent to the plain inner
    join: hot rows spread across salt buckets, cold rows pass through the
    unsalted branch, and the union recovers exactly the plain join's rows."""
    from spark_ensemble_spark.functions.skew import salted_join_hot_keys

    large = spark.createDataFrame(
        [(i, i % 7) for i in range(500)], "row_id int, k int"
    )
    small = spark.createDataFrame(
        [(k, f"v{k}") for k in range(5)], "sk int, val string"  # keys 5,6 unmatched
    )
    plan = {"0": 4, "3": 3}  # stringified keys, per-key salt factors
    got = sorted(
        (r.row_id, r.k, r.sk, r.val)
        for r in salted_join_hot_keys(large, small, "k", "sk", plan).collect()
    )
    want = sorted(
        (r.row_id, r.k, r.sk, r.val)
        for r in large.join(small, F.col("k") == F.col("sk")).collect()
    )
    # keys 0,1,2 appear 72x (500 = 7*71 + 3), keys 3,4 appear 71x; 5,6 unmatched
    assert got == want and len(got) == 3 * 72 + 2 * 71


def test_dup_clusters_auto_salt_equivalence_on_planted_skew(spark):
    """The skew guard end to end (r7 VERDICT #7): a star graph (one hub
    near-matching 300 docs — the boilerplate-page shape) trips the
    pre-flight salt plan at a low rows_per_task, and the salted
    label-propagation resolves EXACTLY the clusters the unsalted path does
    — hub component to the min id, a disjoint chain untouched."""
    from spark_ensemble_spark.functions.skew import hot_key_salt_plan
    from spark_ensemble_spark.operators.dedup import dup_clusters

    hub_pairs = [(0, i) for i in range(1, 301)]
    chain_pairs = [(1000 + i, 1001 + i) for i in range(5)]
    pairs = spark.createDataFrame(
        hub_pairs + chain_pairs, "id_a long, id_b long"
    )
    # construction check: the undirected edge table really is hub-skewed
    edges = pairs.selectExpr("id_a AS src", "id_b AS dst").union(
        pairs.selectExpr("id_b AS src", "id_a AS dst")
    )
    plan = hot_key_salt_plan(edges, "dst", rows_per_task=50)
    assert plan.get("0") == 6  # ceil(300/50)

    plain = {
        r.id: r.cluster_id
        for r in dup_clusters(pairs, skew_rows_per_task=None).collect()
    }
    salted = {
        r.id: r.cluster_id
        for r in dup_clusters(pairs, skew_rows_per_task=50).collect()
    }
    assert salted == plain
    assert all(salted[i] == 0 for i in range(301))
    assert all(salted[1000 + i] == 1000 for i in range(6))


def test_streaming_sessionize_equals_batch(spark, sf_dir):
    from spark_ensemble_spark.streaming.events import (
        sessionize_batch,
        streaming_sessionize,
    )

    stream = streaming_sessionize(spark, sf_dir).collect()
    batch = sessionize_batch(load_table(spark, sf_dir, "events"), 30).collect()
    key = lambda r: (r.user_id, r.session_seq, r.n_events, r.session_value, r.session_start)
    assert sorted(map(key, stream)) == sorted(map(key, batch))


def test_ngram_jaccard_blocking_recall(spark, sf_dir):
    """Planted-dup recall vs brute force: prefix blocking (the SQL-oracle
    harness mode) misses near-dups whose opening differs; minhash-band
    blocking (the production mode) recovers them."""
    from spark_ensemble_spark.operators.dedup import ngram_jaccard_pairs

    docs = (
        load_table(spark, sf_dir, "documents").limit(50).select("doc_id", "text")
    ).cache()
    # near-dups whose OPENING differs: one word prepended to the copy
    dups = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("prepended "), F.col("text")).alias("text"),
    )
    data = docs.unionByName(dups).cache()
    planted = {(i, i + 100000) for i in range(10)}

    # ground truth: brute force (prefix mode with block_prefix=0 -> one
    # block -> all pairs compared)
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            data, "text", "doc_id", threshold=0.5, block_on="prefix", block_prefix=0
        ).collect()
    }
    assert planted <= truth  # prepending one word keeps jaccard >= 0.5

    prefix_found = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            data, "text", "doc_id", threshold=0.5, block_on="prefix"
        ).collect()
    }
    # the documented prefix-block limitation: changed openings are never compared
    assert not (planted & prefix_found)

    # the DEFAULT path is the minhash-band blocker (production mode)
    minhash_found = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(data, "text", "doc_id", threshold=0.5).collect()
    }
    assert planted <= minhash_found
    recall = len(minhash_found & truth) / max(len(truth), 1)
    assert recall >= 0.95, f"default (minhash-block) recall {recall} vs brute force"
    # exact-verify inside blocks: no false positives in either mode
    assert minhash_found <= truth and prefix_found <= truth


def test_streaming_sessionize_event_time_timeout(spark, tmp_path):
    """An idle user's open session is finalized by the EVENT-TIME TIMEOUT when
    the watermark (advanced by other users' later events in a later batch)
    passes last_event + gap — the session closes even though the user never
    sends another event. Also covers multi-batch replay: provisional
    open-session rows are superseded via latest_sessions."""
    import pandas as pd

    from spark_ensemble_spark.streaming.events import (
        latest_sessions,
        read_events_stream,
        sessionized_stream,
    )

    src = tmp_path / "events_src"
    src.mkdir()
    t0 = 1_700_000_000_000_000_000  # epoch nanos

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["props"] = "{}"
        df = spark.createDataFrame(
            pdf,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # batch 1: user 1 has two events 10 min apart (one open session)
    write_file("f1", [(1, t0, 1, "click", 1.0), (2, t0 + 600 * 10**9, 1, "click", 2.0)])
    stream = sessionized_stream(
        read_events_stream(spark, str(src) + "/*", glob=None),
        gap_minutes=30,
        watermark="1 hour",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ett_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: user 2 events 10 hours later -> watermark advances to
        # t0+9h, far past user 1's timeout (last_ts + 30 min)
        write_file("f2", [(3, t0 + 36_000 * 10**9, 2, "click", 5.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    raw = spark.table("t_ett_sessions")
    u1_raw = raw.filter(F.col("user_id") == 1).collect()
    # provisional emission (batch 1) + timeout emission (no-data batch after
    # the watermark advanced) -> the same (user, seq) key appears twice
    assert len(u1_raw) == 2, u1_raw
    final = latest_sessions(raw).filter(F.col("user_id") == 1).collect()
    assert len(final) == 1
    r = final[0]
    assert (r.session_seq, r.n_events, r.session_value) == (1, 2, "3.0000")


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Duplicate keys arriving in LATER micro-batches are dropped (state
    carries across batches); keys whose state the watermark evicted would
    re-emit — the delay is sized to the data span so the output equals batch
    DISTINCT."""
    import pandas as pd

    from spark_ensemble_spark.streaming.events import dedup_stream, read_events_stream

    src = tmp_path / "dedup_src"
    src.mkdir()
    t0 = 1_700_000_000_000_000_000

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["props"] = "{}"
        spark.createDataFrame(
            pdf,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    write_file("f1", [(1, t0, 1, "click", 1.0), (2, t0 + 10**9, 1, "view", 1.0)])
    stream = dedup_stream(
        read_events_stream(spark, str(src) + "/*", glob=None),
        ["user_id", "event_type"],
        delay="2 days",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one duplicate key (1, click) an hour later + one new key
        write_file(
            "f2",
            [(3, t0 + 3600 * 10**9, 1, "click", 9.0), (4, t0 + 3600 * 10**9, 2, "click", 1.0)],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    out = {(r.user_id, r.event_type) for r in spark.table("t_stream_dedup").collect()}
    assert out == {(1, "click"), (1, "view"), (2, "click")}
    assert spark.table("t_stream_dedup").count() == 3  # no duplicate emission


def test_stream_stream_join_across_batches(spark, tmp_path):
    """A click buffered in batch 1 joins a purchase that only arrives in
    batch 2 (stream-stream state held across micro-batches); out-of-window
    purchases don't match."""
    import pandas as pd

    from spark_ensemble_spark.streaming.events import (
        click_purchase_stream,
        read_events_stream,
    )

    src = tmp_path / "attr_src"
    src.mkdir()
    t0 = 1_700_000_000_000_000_000

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["props"] = "{}"
        spark.createDataFrame(
            pdf,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    write_file("f1", [(1, t0, 1, "click", 0.0)])
    stream = click_purchase_stream(
        read_events_stream(spark, str(src) + "/*", glob=None), window_minutes=30
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_attr")
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one purchase inside the window, one outside
        write_file(
            "f2",
            [
                (2, t0 + 600 * 10**9, 1, "purchase", 42.0),
                (3, t0 + 7200 * 10**9, 1, "purchase", 99.0),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("t_attr").collect()
    assert len(rows) == 1
    assert (rows[0].click_id, rows[0].purchase_value, rows[0].us_to_purchase) == (
        1,
        42.0,
        600_000_000,
    )


def test_asof_join_semantics(spark):
    """Backward: latest right at-or-before left ts (inclusive tie); miss →
    NULL payload. Forward: earliest right at-or-after."""
    from spark_ensemble_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 2, "c"), (2, 7, "d")],
        ["k", "lts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 3, 30.0), (1, 5, 50.0), (1, 9, 90.0), (3, 1, 10.0)],
        ["k", "rts", "val"],
    )
    back = {
        (r.k, r.lts): r.val
        for r in asof_join(left, right, "k", "lts", "rts").collect()
    }
    # ts=5 ties right ts=5 → inclusive; ts=2 has no earlier right → NULL
    assert back == {(1, 5): 50.0, (1, 10): 90.0, (1, 2): None, (2, 7): None}

    fwd = {
        (r.k, r.lts): r.val
        for r in asof_join(
            left, right, "k", "lts", "rts", direction="forward"
        ).collect()
    }
    assert fwd == {(1, 5): 50.0, (1, 10): None, (1, 2): 30.0, (2, 7): None}


def test_dup_clusters_long_chain(spark):
    """A 60-node chain converges well within max_rounds thanks to pointer
    jumping (plain one-hop propagation would need 60 rounds)."""
    from spark_ensemble_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["id_a", "id_b"]
    )
    out = dup_clusters(pairs, max_rounds=12)
    assert {r.cluster_id for r in out.collect()} == {0}


def test_asof_join_helper_name_collisions_and_column_order(spark):
    """Frames that already contain __ts/__tag/__filled_* columns must not be
    clobbered, and the output preserves the left frame's column order
    (including the position of the join key) followed by the payloads."""
    from spark_ensemble_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("x", 1, 5, 99), ("y", 1, 10, 98)],
        ["__ts", "k", "lts", "__tag"],
    )
    right = spark.createDataFrame(
        [(1, 3, 30.0, 7)], ["k", "rts", "val", "__filled_val"]
    )
    out = asof_join(left, right, "k", "lts", "rts", payload_cols=["val"])
    assert out.columns == ["__ts", "k", "lts", "__tag", "val"]
    rows = {r["lts"]: r for r in out.collect()}
    assert rows[5]["val"] == 30.0 and rows[5]["__ts"] == "x" and rows[5]["__tag"] == 99
    assert rows[10]["val"] == 30.0 and rows[10]["__ts"] == "y"


def _planted_cosine_pairs(spark, n_pairs, dim, target_cos, seed=5):
    """(vectors df, planted pair set): each planted copy has EXACT cosine
    ``target_cos`` to its original (rotate toward an orthogonalized random
    direction), ids are originals 0..n-1, copies i+1_000_000."""
    import math
    import random

    rng = random.Random(seed)
    rows = []
    planted = set()
    for i in range(n_pairs):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        nv = math.sqrt(sum(x * x for x in v))
        v = [x / nv for x in v]
        u = [rng.gauss(0, 1) for _ in range(dim)]
        d = sum(a * b for a, b in zip(u, v))
        w = [a - d * b for a, b in zip(u, v)]
        nw = math.sqrt(sum(x * x for x in w))
        w = [x / nw for x in w]
        s = math.sqrt(1 - target_cos * target_cos)
        vp = [target_cos * a + s * b for a, b in zip(v, w)]
        rows.append((i, v))
        rows.append((i + 1_000_000, vp))
        planted.add((i, i + 1_000_000))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return df, planted


def test_embedding_dup_pairs_multitable_recall(spark):
    """Multi-table SRP blocking recall at cosine 0.9 (the pairs a single
    table loses for good when they straddle one hyperplane): with 8 tables
    of 6 planes, expected recall is 1-(1-p^6)^8 ≈ 0.98 at p = 1-θ/π ≈ 0.856.
    Deterministic: fixed vector seed + fixed plane seed."""
    dim = 32
    data, planted = _planted_cosine_pairs(spark, 40, dim, 0.9)
    data = data.cache()
    found = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(
            data,
            "embedding",
            "vec_id",
            threshold=0.88,
            num_planes=6,
            num_tables=8,
            dim=dim,
        ).collect()
    }
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(
            data, "embedding", "vec_id", threshold=0.88, brute_force=True
        ).collect()
    }
    assert planted <= brute  # construction sanity: every planted pair is real
    assert found <= brute  # exact verify inside buckets: no false positives
    recall = len(found & planted) / len(planted)
    assert recall >= 0.95, f"multi-table recall {recall} on planted 0.9-cos pairs"


def test_embedding_dup_pairs_degenerate_bucket_cap(spark):
    """Degenerate embeddings (here: 100 copies of one constant vector) land
    in ONE bucket per table, the failure mode the SRP balance argument can't
    cover (VERDICT r5 #3). With ``max_bucket_size`` set, those buckets are
    quarantined BEFORE the self-join so the candidate count is bounded;
    healthy pairs in sparse buckets are untouched; with the cap disabled the
    same input explodes into the full k·(k−1)/2 pair set."""
    import random

    dim = 16
    rnd = random.Random(5)
    const = [1.0] + [0.0] * (dim - 1)
    rows = [(i, const) for i in range(100)]
    v = [rnd.uniform(-1, 1) for _ in range(dim)]
    rows += [(1_000, v), (1_001, list(v))]  # healthy near-dup pair
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    kwargs = dict(threshold=0.9, num_planes=4, num_tables=4, seed=11, dim=dim)
    uncapped = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(
            df, "embedding", "vec_id", max_bucket_size=None, **kwargs
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(
            df, "embedding", "vec_id", max_bucket_size=10, **kwargs
        ).collect()
    }
    # uncapped: the degenerate clique alone contributes 100·99/2 pairs
    assert len(uncapped) >= 100 * 99 // 2
    # capped: every reducer is bounded at cap² — the clique is quarantined
    assert not {p for p in capped if p[0] < 100}, "degenerate clique not capped"
    # the healthy pair (sparse bucket) survives the cap
    assert (1_000, 1_001) in capped
    df.unpersist()


def test_ivf_fixed_centroids_deterministic_subset(spark, sf_dir):
    """Fixed-centroid IVF: deterministic across runs, candidates come from
    probed cells only (a subset of brute force answers per query), and
    recall@1 with nprobe=4/8 matches the KMeans path's floor."""
    from spark_ensemble_spark.operators.similarity import ivf_fixed_centroids

    emb = load_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 10)
    ctr = ivf_fixed_centroids(64, 8, seed=23)
    a = ivf_topk(emb, q, k=3, nprobe=4, centroids=ctr).collect()
    b = ivf_topk(emb, q, k=3, nprobe=4, centroids=ctr).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    exact = {r.query_id: r.neighbor_id for r in brute_force_topk(emb, q, k=1).collect()}
    top1 = {r.query_id: r.neighbor_id for r in a if r.rank == 1}
    hits = sum(1 for k, v in exact.items() if top1.get(k) == v)
    assert hits >= 5, f"fixed-centroid recall@1 {hits}/10"


def test_sessionize_decimal_sum_tick_boundary(spark):
    """Session values landing EXACTLY on a round(·,4) half-tick must format
    identically on Spark and DuckDB regardless of summation order — this is
    the r1/r2 events_sessionize hash-flip class. The DECIMAL(38,6) sum makes
    the aggregate order-independent; both engines round half-up on the exact
    decimal, so .00005 ticks cannot straddle."""
    import datetime

    import duckdb

    # one user, one session; values sum to exactly 0.00005 (a half-tick),
    # another user's sum sits just below at 0.000049
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 0.00001),
        (1, base + datetime.timedelta(seconds=1), 0.00003),
        (1, base + datetime.timedelta(seconds=2), 0.00001),
        (2, base, 0.000049),
        (3, base, 123.45675),  # half-tick at 4 decimals on a larger scale
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r.user_id, r.session_seq): r.session_value
        for r in sessionize_batch(df, gap_minutes=30).collect()
    }
    assert out[(1, 1)] == "0.0001"  # 0.000050 rounds half-up
    assert out[(2, 1)] == "0.0000"
    assert out[(3, 1)] == "123.4568"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v(user_id BIGINT, value DOUBLE); "
        "INSERT INTO v VALUES (1, 0.00001), (1, 0.00003), (1, 0.00001), "
        "(2, 0.000049), (3, 123.45675)"
    )
    oracle = dict(
        con.execute(
            "SELECT user_id, printf('%.4f', round(sum(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE) "
            "FROM v GROUP BY user_id"
        ).fetchall()
    )
    assert oracle == {1: "0.0001", 2: "0.0000", 3: "123.4568"}


def test_redact_pii(spark):
    from spark_ensemble_spark.operators.text import redact, redaction_counts

    rows = [
        (0, "contact me at jane.doe+spam@example.co.uk or http://x.io/p?q=1"),
        (1, "server 10.0.42.7 answered; call 555-867-5309 tomorrow"),
        (2, "nothing sensitive here, just 42 plain words"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r.id: r.clean
        for r in df.select("id", redact(F.col("text")).alias("clean")).collect()
    }
    assert out[0] == "contact me at <EMAIL> or <URL>"
    assert out[1] == "server <IP> answered; call <PHONE> tomorrow"
    assert out[2] == rows[2][1]  # untouched
    counts = df.select(
        "id", *[c.alias(k) for k, c in redaction_counts(F.col("text")).items()]
    ).collect()
    by_id = {r.id: r for r in counts}
    assert by_id[0].email == 1 and by_id[0].url == 1
    assert by_id[1].ipv4 == 1 and by_id[1].phone == 1
    assert sum([by_id[2].email, by_id[2].url, by_id[2].ipv4, by_id[2].phone]) == 0


def test_grouped_weighted_median(spark):
    from spark_ensemble_spark.functions.stats import (
        grouped_weighted_median_of,
        weighted_median_of,
    )

    rows = [
        ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0),
        ("b", 10.0, 5.0), ("b", 20.0, 1.0),
        ("c", 7.0, 1.0),
    ]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    out = {
        r.g: r.weighted_median
        for r in grouped_weighted_median_of(df, "v", "w", ["g"]).collect()
    }
    # group a: cum 1,2,4 of total 4 -> first value with cum >= 2 is v=2
    # group b: cum 5 of 6 at v=10 -> v=10; group c: single value
    assert out == {"a": 2.0, "b": 10.0, "c": 7.0}
    # agrees with the global operator applied per group
    for g, expect in out.items():
        got = weighted_median_of(
            df.filter(F.col("g") == g), "v", "w"
        ).collect()[0].weighted_median
        assert got == expect


def test_exactly_once_sink_across_restarts(spark, tmp_path):
    """foreachBatch idempotent sink: rows written exactly once across a
    stop/restart (same checkpoint), including when the restart re-processes
    files; new data after restart lands incrementally."""
    import pandas as pd

    from spark_ensemble_spark.streaming.events import read_events_stream
    from spark_ensemble_spark.streaming.sinks import write_stream_exactly_once

    src = tmp_path / "eo_src"
    src.mkdir()
    out = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ckpt")
    t0 = 1_700_000_000_000_000_000

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["props"] = "{}"
        spark.createDataFrame(
            pdf,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    write_file("f1", [(1, t0, 1, "click", 1.0), (2, t0 + 10**9, 2, "view", 2.0)])
    q = write_stream_exactly_once(
        read_events_stream(spark, str(src) + "/*", glob=None).select(
            "event_id", "user_id", "event_type"
        ),
        out,
        ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert first == {1, 2}

    # restart from the same checkpoint: nothing new -> no duplicates;
    # then a new file arrives -> only its rows are added
    q = write_stream_exactly_once(
        read_events_stream(spark, str(src) + "/*", glob=None).select(
            "event_id", "user_id", "event_type"
        ),
        out,
        ckpt,
    )
    try:
        q.processAllAvailable()
        write_file("f2", [(3, t0 + 2 * 10**9, 1, "purchase", 5.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3], ids  # exactly once each, no batch replayed twice


def test_streaming_reach_bounds_and_exact_counts(spark, sf_dir):
    """Windowed HLL reach: window set and event counts exactly match batch;
    the approx-distinct estimate lands within 3*rsd of exact."""
    import duckdb

    from spark_ensemble_spark.streaming.events import streaming_user_reach

    got = {r["day"]: r for r in streaming_user_reach(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {
        row[0]: row
        for row in con.execute(
            """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
                   count(DISTINCT user_id) AS exact_users,
                   count(*) AS n_events
            FROM events GROUP BY 1
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for day, w in want.items():
        g = got[day]
        assert g["n_events"] == w[2]
        assert abs(g["approx_users"] - w[1]) <= max(3 * 0.05 * w[1], 2), (day, g, w)


def test_compact_batches(spark, tmp_path):
    """Compaction merges a fragmented batch_id layout into few bounded files
    with identical data and no batch_id column."""
    from spark_ensemble_spark.streaming.sinks import compact_batches

    src = str(tmp_path / "frag")
    for b in range(8):
        spark.range(b * 10, b * 10 + 10).toDF("v").coalesce(1).write.parquet(
            f"{src}/batch_id={b}"
        )
    out = str(tmp_path / "compacted")
    compact_batches(spark, src, out, target_partitions=2)
    df = spark.read.parquet(out)
    assert df.columns == ["v"]
    assert sorted(r["v"] for r in df.collect()) == list(range(80))
    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert 1 <= len(files) <= 2, files


def test_range_join_avoids_nested_loop(spark, sf_dir):
    """The bucketized range join must plan as an equi-join (SortMerge or
    BroadcastHash), never the BroadcastNestedLoopJoin the bare inequality
    predicate degenerates to."""
    from spark_ensemble_spark.queries import range_join_attribution

    plan = range_join_attribution(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan

    # the naive formulation does nested-loop (documents why the operator exists)
    from spark_ensemble_spark.sources.datasets import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    naive = p.join(
        c,
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "Join" in naive_plan


def test_streaming_sessionize_native_matches_batch_closed_sessions(spark, sf_dir):
    """Native session_window streaming (append mode) emits exactly the
    sessions the FINAL watermark closed: batch session_window rows whose
    window end (last event + gap) <= max_ts - watermark_delay."""
    import datetime

    from spark_ensemble_spark.sources.datasets import load_table
    from spark_ensemble_spark.streaming.events import streaming_sessionize_native

    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"])
        for r in streaming_sessionize_native(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    final_wm = ev.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=2)
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.format_string(
                "%.4f",
                F.round(F.sum(F.col("value").cast("decimal(38,6)")), 4).cast(
                    "double"
                ),
            ).alias("session_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
        )
        .select("user_id", "session_start", "n_events", "session_value", "w.end")
        .collect()
    )
    want = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"])
        for r in batch
        if r["end"] <= final_wm
    }
    assert got == want and len(got) > 0


def test_global_running_sum_equals_sequential(spark):
    """Range-partitioned running sum == a sequential scan, including with
    forced multi-partition input and duplicate order-key values broken by id."""
    from spark_ensemble_spark.functions.stats import global_running_sum

    rows = [(i, (i * 7) % 5) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    out = {
        r["id"]: r["running_sum"]
        for r in global_running_sum(df, ["id"], "v", num_ranges=7).collect()
    }
    running = 0
    for i, v in rows:
        running += v
        assert out[i] == running


def test_stateful_sessionize_survives_restart(spark, tmp_path):
    """applyInPandasWithState state must RESTORE from the checkpoint across a
    full query stop/start: a session whose events straddle the restart
    boundary merges into ONE session (state serialization round-trip), and
    session numbering continues."""
    import pandas as pd

    from spark_ensemble_spark.streaming.events import (
        latest_sessions,
        read_events_stream,
        sessionized_stream,
    )

    src = tmp_path / "restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "restart_ckpt")
    t0 = 1_700_000_000_000_000_000

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["props"] = "{}"
        spark.createDataFrame(
            pdf,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    out = str(tmp_path / "restart_out")

    def start():
        # memory sinks don't support checkpoint recovery; the exactly-once
        # foreachBatch parquet sink does — and this doubles as its restart
        # integration test
        from spark_ensemble_spark.streaming.sinks import write_stream_exactly_once

        stream = sessionized_stream(
            read_events_stream(spark, str(src) + "/*", glob=None),
            gap_minutes=30,
            watermark="1 hour",
        )
        return write_stream_exactly_once(stream, out, ckpt)

    # run 1: two events 10 min apart -> one open session in state
    write_file("f1", [(1, t0, 1, "click", 1.0), (2, t0 + 600 * 10**9, 1, "click", 2.0)])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # run 2 (fresh query, same checkpoint): an event 10 min later must EXTEND
    # the restored session, not start a new one
    write_file("f2", [(3, t0 + 1200 * 10**9, 1, "click", 4.0)])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = latest_sessions(
        spark.read.parquet(out).drop("batch_id")
    ).filter(F.col("user_id") == 1).collect()
    assert len(final) == 1, final
    r = final[0]
    assert (r["session_seq"], r["n_events"], r["session_value"]) == (1, 3, "7.0000")


def test_streaming_ingest_pipeline_end_to_end(spark, tmp_path):
    """Composition test: file stream -> bounded-state dedup -> filter ->
    exactly-once parquet sink, across TWO micro-batches with a duplicate
    arriving late. Each stage is unit-tested alone; this proves they compose
    (watermarks propagate, the sink sees the deduped stream, nothing
    double-counts across batches)."""
    import pandas as pd

    from spark_ensemble_spark.streaming.events import read_events_stream
    from spark_ensemble_spark.streaming.sinks import write_stream_exactly_once

    src = tmp_path / "ingest_src"
    src.mkdir()
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ingest_ckpt")
    t0 = 1_700_000_000_000_000_000

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["props"] = "{}"
        spark.createDataFrame(
            pdf,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # batch 1: two keys, one below the value filter
    write_file(
        "f1",
        [
            (1, t0, 1, "click", 5.0),
            (2, t0 + 10**9, 2, "click", 0.5),  # filtered out
        ],
    )
    stream = (
        read_events_stream(spark, str(src) + "/*", glob=None)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .filter(F.col("value") >= 1.0)
        .select("event_id", "user_id", "event_type", "value")
    )
    q = write_stream_exactly_once(stream, out, ckpt)
    try:
        q.processAllAvailable()
        # batch 2: a LATE DUPLICATE of (1, click) plus a genuinely new key
        write_file(
            "f2",
            [
                (3, t0 + 2 * 10**9, 1, "click", 9.0),  # dup key: dropped
                (4, t0 + 3 * 10**9, 3, "view", 2.0),  # new: kept
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in rows)
    # kept: first (1,click) and the new (3,view); dropped: low-value + dup
    assert ids == [1, 4], ids


def test_dedup_against_corpus_planted(spark):
    """Exact dup of a corpus doc is dropped at stage 1; a near dup at stage
    2; a fresh doc survives; a precomputed corpus-signature index gives the
    identical result (the 100 TB path)."""
    from spark_ensemble_spark.operators.dedup import (
        dedup_against_corpus,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text about spark plans")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base),               # exact dup -> stage 1
            (101, near),               # near dup -> stage 2
            (102, "entirely novel content that matches nothing at all here"),
        ],
        "doc_id long, text string",
    )
    out = dedup_against_corpus(
        new, corpus, "text", "doc_id", threshold=0.4, shingle_size=2
    )
    assert sorted(r.doc_id for r in out.collect()) == [102]

    idx = minhash_signatures(
        corpus, "text", "doc_id", num_hashes=48, shingle_size=2
    ).persist()
    out2 = dedup_against_corpus(
        new,
        corpus,
        "text",
        "doc_id",
        threshold=0.4,
        shingle_size=2,
        corpus_signatures=idx,
    )
    assert sorted(r.doc_id for r in out2.collect()) == [102]
    idx.unpersist()


def test_dedup_index_remove_equals_rebuild(spark):
    """Tombstone maintenance for the incremental-dedup index: after a
    takedown wave, serving dedup_against_corpus from the maintained
    (signatures, fingerprint-holders) index equals serving from an index
    rebuilt on the post-delete corpus — INCLUDING the shared-fingerprint
    case: doc 1 and doc 3 are exact twins, doc 1 is removed, and the
    fingerprint must survive through doc 3 (the fp-only distinct index
    could not express this removal)."""
    from spark_ensemble_spark.operators.dedup import (
        corpus_fingerprint_holders,
        dedup_against_corpus,
        minhash_signatures,
        remove_from_dedup_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different corpus text about spark plans"),
            (3, base),  # exact twin of 1: its fp must survive 1's removal
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base),  # still an exact dup via surviving doc 3
            (101, near),  # near dup of 3
            (102, "entirely novel content that matches nothing at all here"),
            (103, "completely different corpus text about spark plans"),
        ],
        "doc_id long, text string",
    )
    sig_kw = dict(num_hashes=48, shingle_size=2)
    sigs = minhash_signatures(corpus, "text", "doc_id", **sig_kw)
    holders = corpus_fingerprint_holders(corpus, "text", "doc_id")
    removed = spark.createDataFrame([(1,), (2,)], "doc_id long")
    m_sigs, m_holders = remove_from_dedup_index(sigs, holders, removed)

    def serve(s, h):
        return sorted(
            r.doc_id
            for r in dedup_against_corpus(
                new,
                None if s is not None else corpus,
                "text",
                "doc_id",
                threshold=0.4,
                shingle_size=2,
                num_hashes=48,
                corpus_signatures=s,
                corpus_fingerprints=h.select("__fp").distinct(),
            ).collect()
        )

    post = corpus.filter(~F.col("doc_id").isin(1, 2))
    maintained = serve(m_sigs, m_holders)
    rebuilt = serve(
        minhash_signatures(post, "text", "doc_id", **sig_kw),
        corpus_fingerprint_holders(post, "text", "doc_id"),
    )
    assert maintained == rebuilt
    # doc 100 still exact-dups via surviving twin 3; 101 still near-dups 3;
    # 103's only match (doc 2) was removed, so it now survives
    assert maintained == [102, 103]


def test_dedup_against_corpus_empty_corpus(spark):
    from spark_ensemble_spark.operators.dedup import dedup_against_corpus

    new = spark.createDataFrame(
        [(1, "some text here for the batch")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame([], "doc_id long, text string")
    out = dedup_against_corpus(new, corpus, "text", "doc_id")
    assert [r.doc_id for r in out.collect()] == [1]


def test_pq_topk_planted_duplicate_ranks_first(spark):
    """A corpus vector identical to the query achieves the minimal possible
    ADC distance (its codes are the argmin of every LUT row), so it must rank
    1; shapes and determinism hold."""
    import random

    from spark_ensemble_spark.operators.similarity import (
        pq_encode,
        pq_fixed_codebooks,
        pq_topk,
    )

    rng = random.Random(5)
    dim, n = 16, 40
    books = pq_fixed_codebooks(dim=dim, num_subspaces=4, num_codewords=8, seed=3)

    def vec():
        v = [rng.gauss(0, 1) for _ in range(dim)]
        s = sum(x * x for x in v) ** 0.5
        return [x / s for x in v]

    q = vec()
    rows = [(0, q), (100, q)] + [(i, vec()) for i in range(1, n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_topk(df, df.filter(F.col("vec_id") == 0), books, k=5)
    got = sorted(out.collect(), key=lambda r: r.rank)
    assert len(got) == 5
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]
    assert got[0].neighbor_id == 100  # the planted duplicate
    # deterministic
    again = sorted(pq_topk(df, df.filter(F.col("vec_id") == 0), books, k=5).collect(),
                   key=lambda r: r.rank)
    assert [(r.neighbor_id, r.adc_dist) for r in got] == [
        (r.neighbor_id, r.adc_dist) for r in again
    ]
    # codes are valid codeword ids
    codes = pq_encode(df, books).collect()
    assert all(0 <= c < 8 for r in codes for c in r.codes)
    assert all(len(r.codes) == 4 for r in codes)


def test_rerank_topk_restores_exact_order(spark):
    """The two-stage pattern: a lossy shortlist (here deliberately
    mis-ordered) reranked with exact cosine returns the brute-force order
    restricted to shortlist members — and recall@k of the reranked list is
    >= the shortlist's own top-k head."""
    import random

    from spark_ensemble_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        rerank_topk,
    )

    rng = random.Random(11)
    dim, n = 12, 30

    def vec():
        v = [rng.gauss(0, 1) for _ in range(dim)]
        s = sum(x * x for x in v) ** 0.5
        return [x / s for x in v]

    rows = [(i, vec()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2)
    exact = brute_force_topk(df, q, k=8)
    # a worst-case shortlist: the exact top-8 REVERSED (ranks flipped)
    shortlist = exact.select(
        "query_id", "neighbor_id", (F.lit(9) - F.col("rank")).alias("rank")
    )
    reranked = rerank_topk(df, q, shortlist, k=8)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in reranked.collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in exact.collect()
    }
    assert got == want  # exact order restored from a scrambled shortlist
    # recall of rerank top-4 >= recall of the (scrambled) shortlist head
    r_short = {
        r.query_id: r.recall
        for r in ann_recall(shortlist, exact, 4).collect()
    }
    r_rerank = {
        r.query_id: r.recall
        for r in ann_recall(reranked, exact, 4).collect()
    }
    assert all(r_rerank[qid] >= r_short[qid] for qid in r_rerank)
    assert all(r_rerank[qid] == 1.0 for qid in r_rerank)


def test_hamming_topk_planted_duplicate_and_packing(spark):
    """Sign-bit packing and Hamming ranking: a planted exact duplicate has
    distance 0 and ranks first; an exact sign-flip of the query ranks LAST
    among scored candidates (distance = dim); packed words match a plain
    Python popcount replay."""
    import random

    from spark_ensemble_spark.operators.embeddings import l2_normalize  # noqa: F401
    from spark_ensemble_spark.operators.similarity import hamming_topk

    rng = random.Random(7)
    dim, n = 64, 25

    def vec():
        return [rng.gauss(0, 1) for _ in range(dim)]

    q = vec()
    rows = (
        [(0, q), (500, list(q)), (600, [-x for x in q])]
        + [(i, vec()) for i in range(1, n)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hamming_topk(df, df.filter(F.col("vec_id") == 0), k=n + 2, dim=dim)
    got = sorted(out.collect(), key=lambda r: r.rank)
    assert got[0].neighbor_id == 500 and got[0].hamming == 0
    assert got[-1].neighbor_id == 600 and got[-1].hamming == dim
    # plain-python replay of one candidate's distance
    def bits(v):
        return [1 if x > 0 else 0 for x in v]

    cand = dict(rows)[3]
    want = sum(a != b for a, b in zip(bits(q), bits(cand)))
    assert {r.neighbor_id: r.hamming for r in got}[3] == want


def test_chunk_dedup_planted(spark):
    """A passage repeated across docs survives only in the earliest doc; a
    fully-duplicated doc returns empty; within-doc repeats keep first pos."""
    from spark_ensemble_spark.operators.dedup import chunk_dedup

    p = "alpha beta gamma delta"  # one 4-word chunk at chunk_words=4
    docs = spark.createDataFrame(
        [
            (1, p + " unique tail one two"),        # owns the passage
            (2, p),                                  # fully duplicated
            (3, "other words entirely here " + p),  # passage chunk-aligned at pos 1
            (4, p + " " + p),                        # within-doc repeat
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dedup(docs, "text", "doc_id", 4).collect()}
    # doc 1 keeps both its chunks
    assert out[1].text_dedup == p + " unique tail one two"
    assert (out[1].n_chunks_kept, out[1].n_chunks) == (2, 2)
    # doc 2 is the exact passage again -> fully removed, still present
    assert out[2].text_dedup == "" and out[2].n_chunks_kept == 0
    # doc 3: 8 words -> 2 aligned chunks; the second IS the passage and is
    # removed (doc 1 owns it), the first survives
    assert out[3].text_dedup == "other words entirely here"
    assert (out[3].n_chunks_kept, out[3].n_chunks) == (1, 2)
    # doc 4: chunk appears twice at aligned positions; both lose to doc 1
    assert out[4].text_dedup == "" and out[4].n_chunks == 2


def test_resolve_duplicates_end_to_end(spark):
    """pairs -> clusters -> cleaned corpus: one representative (min id) per
    connected component, untouched singletons survive."""
    from spark_ensemble_spark.operators.dedup import resolve_duplicates

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    # components: {0,1,2} (chained), {5,6}; 3,4,7 untouched
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in resolve_duplicates(docs, pairs, "doc_id").collect()
    )
    assert kept == [0, 3, 4, 5, 7]


def test_pq_trained_codebooks_improve_quantization(spark, sf_dir):
    """Per-subspace KMeans books must reconstruct the corpus better than the
    fixed pseudo-random books (lower TRUE quantization error: each vector's
    distance to its own nearest codewords — pq_topk can't measure this, it
    excludes self-matches), and the trained books slot into the same
    encode/topk path."""
    from spark_ensemble_spark.operators.similarity import (
        pq_fixed_codebooks,
        pq_topk,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    fixed = pq_fixed_codebooks(dim=64, num_subspaces=8, num_codewords=16)
    trained = pq_train_codebooks(
        emb, dim=64, num_subspaces=8, num_codewords=16, max_iter=4
    )
    assert len(trained) == 8 and all(len(b) == 16 for b in trained)

    vecs = [list(map(float, r.embedding)) for r in emb.limit(50).collect()]

    def reconstruction_error(books):
        sub = 64 // len(books)
        total = 0.0
        for v in vecs:
            for m, book in enumerate(books):
                s = v[m * sub : (m + 1) * sub]
                total += min(
                    sum((a - b) * (a - b) for a, b in zip(s, c)) for c in book
                )
        return total / len(vecs)

    assert reconstruction_error(trained) < reconstruction_error(fixed)
    # and the trained books drive the same distributed path
    out = pq_topk(emb, emb.filter(F.col("vec_id") < 2), trained, k=3)
    assert out.count() == 6


def test_pq_index_roundtrip(spark, tmp_path):
    """save_pq_index/load_pq_index: codes and books survive byte-identical."""
    from spark_ensemble_spark.operators.similarity import (
        load_pq_index,
        pq_encode,
        pq_fixed_codebooks,
        save_pq_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    books = pq_fixed_codebooks(dim=64, num_subspaces=8, num_codewords=16)
    p = str(tmp_path / "pq_index")
    save_pq_index(emb, books, p)
    codes, loaded_books = load_pq_index(spark, p)
    assert loaded_books == books
    want = {r.id: list(r.codes) for r in pq_encode(emb, books).collect()}
    got = {r.id: list(r.codes) for r in codes.collect()}
    assert got == want


def test_pq_index_resave_overwrites(spark, tmp_path):
    """Re-saving an index to the same path must overwrite cleanly (the old
    RDD-text writer threw AFTER codes were rewritten, leaving a torn index)."""
    from spark_ensemble_spark.operators.similarity import (
        load_pq_index,
        pq_fixed_codebooks,
        save_pq_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(20)
    p = str(tmp_path / "pq_idx2")
    b1 = pq_fixed_codebooks(dim=64, num_subspaces=8, num_codewords=16, seed=1)
    b2 = pq_fixed_codebooks(dim=64, num_subspaces=8, num_codewords=16, seed=2)
    save_pq_index(emb, b1, p)
    save_pq_index(emb, b2, p)  # must not raise; must fully replace
    codes, books = load_pq_index(spark, p)
    assert books == b2
    assert codes.count() == 20


def test_dedup_against_corpus_with_fingerprint_index(spark):
    """The fully-indexed path (signatures + fingerprints precomputed) gives
    the same survivors without touching corpus text."""
    from spark_ensemble_spark.operators.dedup import (
        corpus_fingerprint_index,
        dedup_against_corpus,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "different corpus text about catalyst plans")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base), (101, "entirely novel content matching nothing here")],
        "doc_id long, text string",
    )
    sig_idx = minhash_signatures(corpus, "text", "doc_id", num_hashes=48, shingle_size=2)
    fp_idx = corpus_fingerprint_index(corpus)
    out = dedup_against_corpus(
        new,
        corpus,
        "text",
        "doc_id",
        threshold=0.4,
        shingle_size=2,
        corpus_signatures=sig_idx,
        corpus_fingerprints=fp_idx,
    )
    assert sorted(r.doc_id for r in out.collect()) == [101]


def test_dup_clusters_string_ids(spark):
    """String-id pair graphs must resolve correctly (the numeric label-sum
    convergence shortcut is gated to numeric ids; strings take the generic
    join-based check — a NULLed or lexicographic sum would fake instant
    convergence and split chained clusters)."""
    from spark_ensemble_spark.operators.dedup import dup_clusters

    # a 5-node chain plus a numeric-string trap: min('10','9') = '10'
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("9", "10")],
        "id_a string, id_b string",
    )
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert {got[k] for k in "abcde"} == {"a"}
    assert got["9"] == got["10"] == "10"  # lexicographic min, consistently


def test_semantic_dedup_drop_rule_and_cluster_scoping(spark):
    """SemDeDup semantics on hand-built geometry: two orthogonal centroids;
    a near-identical pair inside cluster 0 must drop the member CLOSER to
    the centroid (keep the atypical one, per the paper); a high-cosine pair
    that straddles the cluster boundary is never compared — SemDeDup's
    scope is within-cluster only."""
    from spark_ensemble_spark.operators.dedup import (
        semantic_dedup,
        semantic_dup_pairs,
    )

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (1, [0.95, 0.05, 0.0, 0.0]),  # cluster 0, close to centroid
        (2, [0.80, 0.05, 0.0, 0.0]),  # cluster 0, same direction, farther out
        (3, [0.70, 0.71, 0.0, 0.0]),  # cluster 1 side of the boundary
        (4, [0.71, 0.70, 0.0, 0.0]),  # cluster 0 side; cos(3,4) ≈ 0.9998
        (5, [0.0, 0.9, 0.1, 0.0]),  # cluster 1, no near-dup
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = semantic_dup_pairs(df, "embedding", "vec_id", cents, threshold=0.99)
    got = {(r.id_a, r.id_b): r.drop_id for r in pairs.collect()}
    # vectors 1 and 2 are colinear (cosine 1.0): 1 is nearer the centroid
    # and must be the drop; the 3-4 boundary pair must be absent entirely
    assert got == {(1, 2): 1}
    kept = semantic_dedup(df, "embedding", "vec_id", cents, threshold=0.99)
    assert {r.vec_id for r in kept.collect()} == {2, 3, 4, 5}
    by_id = {r.vec_id: r.cluster for r in kept.collect()}
    assert by_id[3] == 1 and by_id[4] == 0
    # column hygiene (ADVICE r5): an input already carrying the reserved
    # output name fails loudly; a colliding temp name is fresh-named away
    import pytest

    with pytest.raises(ValueError, match="cluster"):
        semantic_dedup(
            df.withColumn("cluster", F.lit(0)), "embedding", "vec_id", cents
        )
    with_v = semantic_dedup(
        df.withColumn("__v", F.lit("x")), "embedding", "vec_id", cents, 0.99
    )
    assert {r.vec_id for r in with_v.collect()} == {2, 3, 4, 5}
    assert "__v" in with_v.columns  # caller's column untouched


def test_semantic_dedup_hot_cluster_quarantine(spark):
    """A degenerate cluster above max_cluster_size produces NO pairs (its
    rows all survive) — skew protection can delay dedup but never delete
    data."""
    from spark_ensemble_spark.operators.dedup import (
        semantic_dedup,
        semantic_dup_pairs,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    hot = [(i, [1.0, 0.001 * i]) for i in range(40)]  # all cluster 0
    ok = [(100, [0.01, 1.0]), (101, [0.01, 1.0])]  # cluster 1 twin pair
    df = spark.createDataFrame(hot + ok, ["vec_id", "embedding"])
    pairs = semantic_dup_pairs(
        df, "embedding", "vec_id", cents, threshold=0.99, max_cluster_size=10
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(100, 101)}  # hot cluster quarantined, healthy one not
    kept = semantic_dedup(
        df, "embedding", "vec_id", cents, threshold=0.99, max_cluster_size=10
    )
    assert kept.count() == 41  # only the twin's drop_id is removed


def test_bm25_tombstone_stream_redelivery_not_double_decremented(
    spark, tmp_path
):
    """A doc id re-delivered in a LATER micro-batch must not decrement the
    (n_docs, sum_dl) stats a second time (the posting anti-join was always
    idempotent; a duplicate negative partial silently skews avgdl and every
    served score — ADVICE r10).  Batch 1 removes {0, 5}; batch 2 re-delivers
    0 and adds 10: the merged index must equal a from-scratch build on the
    corpus minus {0, 5, 10} exactly."""
    from spark_ensemble_spark.operators.retrieval import build_bm25_index
    from spark_ensemble_spark.streaming.corpus import (
        bm25_tombstone_stream,
        read_bm25_index_dir,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common tok{i}") for i in range(20)],
        "doc_id long, text string",
    )
    base = str(tmp_path / "idx")
    postings, stats = build_bm25_index(docs)
    postings.write.parquet(f"{base}/postings/batch_id=0")
    stats.write.parquet(f"{base}/stats/batch_id=0")

    src = tmp_path / "removed_src"
    src.mkdir()

    def write_wave(name, ids):
        docs.filter(F.col("doc_id").isin(ids)).coalesce(1).write.parquet(
            str(src / name)
        )

    write_wave("f1", [0, 5])
    removed = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*"
    )
    q = bm25_tombstone_stream(
        removed, index_path=base, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        write_wave("f2", [0, 10])  # 0 is a cross-batch re-delivery
        q.processAllAvailable()
    finally:
        q.stop()

    got_postings, got_stats = read_bm25_index_dir(spark, base)
    want_postings, want_stats = build_bm25_index(
        docs.filter(~F.col("doc_id").isin([0, 5, 10]))
    )
    assert got_stats.collect() == want_stats.collect()
    key = ["term", "doc_id", "tf", "dl"]
    assert sorted(map(tuple, got_postings.select(*key).collect())) == sorted(
        map(tuple, want_postings.select(*key).collect())
    )


def test_bm25_compaction_redelivery_not_double_decremented(spark, tmp_path):
    """A takedown re-delivered AFTER compaction must not decrement the
    compacted stats (code-review r11): compaction folds the delete history
    into the generation, so without the compacted_tombstones carry-forward
    a fresh tombstone stream on gen2 would write a negative partial for a
    doc gen2's stats no longer count.  Waves: gen1 deletes {0, 5} →
    compact → gen2 stream re-delivers 0 and newly deletes 10: gen2 must
    serve exactly the corpus minus {0, 5, 10}."""
    from spark_ensemble_spark.operators.retrieval import build_bm25_index
    from spark_ensemble_spark.streaming.corpus import (
        bm25_tombstone_stream,
        compact_bm25_index_dir,
        read_bm25_index_dir,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common tok{i}") for i in range(20)],
        "doc_id long, text string",
    )
    gen1, gen2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    postings, stats = build_bm25_index(docs)
    postings.write.parquet(f"{gen1}/postings/batch_id=0")
    stats.write.parquet(f"{gen1}/stats/batch_id=0")

    src1 = tmp_path / "wave1"
    src1.mkdir()
    docs.filter(F.col("doc_id").isin([0, 5])).coalesce(1).write.parquet(
        str(src1 / "f1")
    )
    q = bm25_tombstone_stream(
        spark.readStream.schema("doc_id long, text string").parquet(
            str(src1) + "/*"
        ),
        index_path=gen1,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    compact_bm25_index_dir(spark, gen1, gen2)
    import os

    assert not os.path.isdir(f"{gen2}/tombstones")
    assert os.path.isdir(f"{gen2}/compacted_tombstones")

    src2 = tmp_path / "wave2"
    src2.mkdir()
    docs.filter(F.col("doc_id").isin([0, 10])).coalesce(1).write.parquet(
        str(src2 / "f2")
    )
    q2 = bm25_tombstone_stream(
        spark.readStream.schema("doc_id long, text string").parquet(
            str(src2) + "/*"
        ),
        index_path=gen2,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got_postings, got_stats = read_bm25_index_dir(spark, gen2)
    want_postings, want_stats = build_bm25_index(
        docs.filter(~F.col("doc_id").isin([0, 5, 10]))
    )
    assert got_stats.collect() == want_stats.collect()
    key = ["term", "doc_id", "tf", "dl"]
    assert sorted(map(tuple, got_postings.select(*key).collect())) == sorted(
        map(tuple, want_postings.select(*key).collect())
    )
    # in-place compaction must be refused
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_bm25_index_dir(spark, gen2, gen2)


def test_streaming_decontaminate_equals_batch(spark, sf_dir):
    """The stateless stream filter must make the IDENTICAL decision as the
    batch Bloom pass — same flag counts, same kept set — and every eval-set
    member must self-flag at ratio 1.0 and be dropped."""
    from spark_ensemble_spark.operators.corpus import (
        bloom_contamination,
        ngram_bloom_build,
    )
    from spark_ensemble_spark.sources.datasets import load_table
    from spark_ensemble_spark.streaming.corpus import streaming_decontaminate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = ngram_bloom_build(
        docs.filter(F.col("doc_id") % 20 == 0), "text", 8, 1 << 20, 4
    )
    batch = {
        r.doc_id: (r.n_shingles, r.n_flagged)
        for r in bloom_contamination(docs, words, shingle_size=8).collect()
        if round(r.n_flagged / r.n_shingles, 6) <= 0.5
    }
    streamed = {
        r.doc_id: (r.n_shingles, r.n_flagged)
        for r in streaming_decontaminate(spark, sf_dir).collect()
    }
    assert streamed == batch
    kept_ids = set(streamed)
    assert not any(i % 20 == 0 for i in kept_ids)  # eval members dropped
    assert kept_ids  # but the filter is not degenerate


def test_score_stream_tree_model_equals_batch(spark, sf_dir):
    """Online inference parity with a NON-trivial model: a bagged tree
    ensemble fitted on the batch events table must score the replayed stream
    exactly like the batch transform (same rows, same rounded predictions) —
    ensemble transforms are pure column expressions, so stream composition
    must be lossless, not merely shape-compatible."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.regression import DecisionTreeRegressor

    from spark_ensemble_spark.regression.bagging import BaggingRegressor
    from spark_ensemble_spark.sources.datasets import load_events
    from spark_ensemble_spark.streaming.events import read_events_stream
    from spark_ensemble_spark.streaming.runner import replay_session, run_to_memory
    from spark_ensemble_spark.streaming.scoring import score_stream

    spark2 = replay_session(spark)

    def feats(df):
        return df.select(
            "event_id",
            array_to_vector(
                F.array(
                    F.coalesce(F.col("value"), F.lit(0.0)),
                    (F.col("user_id") % 10).cast("double"),
                )
            ).alias("features"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("label"),
        )

    batch = feats(load_events(spark2, sf_dir))
    model = BaggingRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=3),
        numBaseLearners=3,
        seed=5,
    ).fit(batch)
    expected = {
        (r.event_id, r.prediction)
        for r in model.transform(batch)
        .select("event_id", F.round("prediction", 6).alias("prediction"))
        .collect()
    }
    scored = score_stream(model, feats(read_events_stream(spark2, sf_dir))).select(
        "event_id", F.round("prediction", 6).alias("prediction")
    )
    got = {
        (r.event_id, r.prediction)
        for r in run_to_memory(scored, "append", "score_tree").collect()
    }
    assert got == expected
    assert len({p for _, p in got}) > 1  # the tree actually discriminates


def test_incremental_dedup_stream_two_deliveries(spark, tmp_path):
    """Dedup-on-arrival across micro-batches: delivery 2's exact and near
    duplicates of delivery 1's accepted docs are rejected via the persisted
    signature index (accepted text is never re-read), while its genuinely
    new content lands; within-delivery dups resolve to the min id."""
    from spark_ensemble_spark.streaming.corpus import incremental_dedup_stream

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    other = "one two three four five six seven eight nine ten " * 3
    fresh = "red orange yellow green blue indigo violet umber ochre teal " * 3
    src = tmp_path / "docs_src"
    src.mkdir()

    def deliver(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    deliver("d1", [(1, base), (2, other), (3, base)])  # 3 = exact dup of 1
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*"
    )
    q = incremental_dedup_stream(
        spark,
        stream,
        out_path=str(tmp_path / "corpus"),
        index_path=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        accepted1 = {
            r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
        }
        assert accepted1 == {1, 2}
        deliver(
            "d2",
            [
                (10, base),  # exact dup of accepted 1 → rejected by index
                (11, other.replace("five", "FIVE", 1)),  # near dup of 2
                (12, fresh),  # genuinely new
                (13, fresh),  # exact dup inside the delivery
                (14, fresh.replace("blue", "BLUE", 1)),  # near dup inside
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    final = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    assert final == {1, 2, 12}
    # the index grew by exactly the accepted docs' signatures
    sigs = spark.read.parquet(str(tmp_path / "index") + "/sig")
    assert {r.id for r in sigs.select("id").collect()} == {1, 2, 12}


def test_incremental_dedup_stream_replay_does_not_lose_data(spark, tmp_path):
    """Crash-replay safety: a batch that re-runs AFTER its index partitions
    were already written must not dedup against its own output (that would
    reject every doc and overwrite the corpus with an empty frame). Replay
    is simulated by wiping the checkpoint so the same file re-processes as
    batch 0 over the existing batch_id=0 index."""
    import shutil

    from spark_ensemble_spark.streaming.corpus import incremental_dedup_stream

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    src = tmp_path / "docs_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven eight nine ten " * 3)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "d1"))

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src) + "/*"
        )
        q = incremental_dedup_stream(
            spark,
            stream,
            out_path=str(tmp_path / "corpus"),
            index_path=str(tmp_path / "index"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    shutil.rmtree(str(tmp_path / "ckpt"))  # lose the offset commit → replay
    run_once()
    final = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    assert final == {1, 2}  # replay rewrote, never self-rejected


def test_semantic_dedup_with_trained_centroids(spark, sf_dir):
    """The production path: centroids exported from a KMeans fit (plain
    float lists, the same contract ivf_topk's trained mode uses) drop into
    semantic_dedup unchanged — planted identical twins still lose exactly
    one member per pair regardless of which engine trained the quantizer."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from spark_ensemble_spark.operators.dedup import semantic_dedup
    from spark_ensemble_spark.sources.datasets import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") < 10).withColumn(
            "vec_id", F.col("vec_id") + F.lit(1_000_000)
        )
    )
    feat = planted.select(
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("feat")
    )
    km = KMeans(k=4, seed=7, maxIter=5, featuresCol="feat").fit(feat)
    cents = [list(map(float, c)) for c in km.clusterCenters()]
    kept = {
        r.vec_id
        for r in semantic_dedup(
            planted, "embedding", "vec_id", cents, threshold=0.95
        ).collect()
    }
    for i in range(10):  # identical twins share every centroid distance:
        # exactly one of (i, i+1e6) survives, whichever the tie-break picks
        assert (i in kept) != (i + 1_000_000 in kept)


def test_incremental_dedup_stream_torn_index_recovers(spark, tmp_path):
    """A torn first-batch index write (directories exist, no committed
    parquet) must be treated as 'no index yet' — the batch's own overwrite
    repairs it — rather than failing schema inference forever in a
    checkpoint replay loop."""
    from spark_ensemble_spark.streaming.corpus import incremental_dedup_stream

    (tmp_path / "index" / "sig" / "batch_id=0").mkdir(parents=True)
    (tmp_path / "index" / "fp" / "batch_id=0").mkdir(parents=True)
    src = tmp_path / "docs_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 5), (2, "one two three four " * 5)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "d1"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*"
    )
    q = incremental_dedup_stream(
        spark,
        stream,
        out_path=str(tmp_path / "corpus"),
        index_path=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert got == {1, 2}


def test_embedding_dup_pairs_zero_vector_never_duplicates(spark):
    """Two all-zero vectors have undefined cosine: they must neither crash
    (ANSI 0/0) nor be marked duplicates of each other or of anything."""
    from spark_ensemble_spark.operators.dedup import embedding_dup_pairs

    rows = [
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [1.0, 0.001, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(
            df, "embedding", "vec_id", threshold=0.99, brute_force=True
        ).collect()
    }
    assert pairs == {(3, 4)}


def test_funnel_conversion_semantics(spark):
    """Greedy earliest-match funnel: order matters (a click BEFORE the
    first view doesn't count), the horizon cuts late conversions, and an
    empty entry step yields NULL conversions rather than dividing by
    zero."""
    import datetime as dt

    from spark_ensemble_spark.streaming.events import funnel_conversion

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)
    rows = [
        # user 1: view -> click -> purchase, all in order
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: click BEFORE the view — click step not reached
        (2, t(0), "click"), (2, t(1), "view"),
        # user 3: view then click 2 HOURS later — outside a 1-hour horizon
        (3, t(0), "view"), (3, dt.datetime(2026, 1, 1, 2, 0), "click"),
        # user 4: never enters the funnel
        (4, t(0), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.step_name: (r.n_users, r.conversion)
        for r in funnel_conversion(
            df, ["view", "click", "purchase"], horizon_us=3600 * 1_000_000
        ).collect()
    }
    assert out == {
        "view": (3, 1.0),
        "click": (1, round(1 / 3, 6)),
        "purchase": (1, round(1 / 3, 6)),
    }
    empty = funnel_conversion(
        df.filter(F.col("event_type") == "purchase"),
        ["view", "click"],
    ).collect()
    assert [(r.n_users, r.conversion) for r in empty] == [(0, None), (0, None)]


def test_fuzzy_join_left_keeps_unmatched(spark):
    """how='left' keeps rows with no fuzzy partner (NULL right side, NULL
    dist) — the match-or-review pipeline shape; inner drops them. Blocking
    is by normalized prefix, so a prefix-breaking edit is (documented)
    missed."""
    from spark_ensemble_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "Widget Mark II"), (2, "Gadget Pro"), (3, "Unique Thing")],
        ["id", "name"],
    )
    right = spark.createDataFrame(
        [(10, "widget mark ii "), (20, "gadget pros"), (30, "XXnique Thing")],
        ["rid", "rname"],
    )
    inner = fuzzy_join(left, right, "name", "rname", max_distance=1)
    got = {(r["id"], r["rid"], r["__dist"]) for r in inner.collect()}
    # 1↔10 normalized-equal (dist 0); 2↔20 one insertion; 3↔30 blocked away
    assert got == {(1, 10, 0), (2, 20, 1)}
    left_out = fuzzy_join(left, right, "name", "rname", max_distance=1, how="left")
    by_id = {(r["id"], r["rid"], r["__dist"]) for r in left_out.collect()}
    assert (3, None, None) in by_id and len(by_id) == 3


def test_cohort_retention_matrix(spark):
    """Hand-built two-cohort fixture: retention fractions and offsets are
    exact; a user counts in its FIRST-event cohort only; offset 0 is always
    the full cohort."""
    import datetime as dt

    from spark_ensemble_spark.streaming.events import cohort_retention

    # cohort A = week of Mon 2026-01-05: users 1,2; user 1 returns in week+1
    # cohort B = week of Mon 2026-01-12: user 3 (also active week+2)
    rows = [
        (1, dt.datetime(2026, 1, 5, 10)), (2, dt.datetime(2026, 1, 7, 9)),
        (1, dt.datetime(2026, 1, 14, 8)),   # A, offset 1
        (3, dt.datetime(2026, 1, 12, 12)),
        (3, dt.datetime(2026, 1, 26, 12)),  # B, offset 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_week, r.week_offset): (r.n_users, r.retention)
        for r in cohort_retention(df).collect()
    }
    assert out == {
        ("2026-01-05", 0): (2, 1.0),
        ("2026-01-05", 1): (1, 0.5),
        ("2026-01-12", 0): (1, 1.0),
        ("2026-01-12", 2): (1, 1.0),
    }


def test_fuzzy_join_same_column_name_and_collisions(spark):
    """The natural entity-resolution shape — both catalogs call the column
    'name' — must work (alias-qualified refs), and a caller __dist column
    must not be clobbered (fresh-name discipline)."""
    from spark_ensemble_spark.operators.joins import fuzzy_join

    a = spark.createDataFrame([(1, "widget mk ii", 9)], ["id", "name", "__dist"])
    b = spark.createDataFrame([(10, "widget mk iii")], ["rid", "name"])
    out = fuzzy_join(a, b, "name", "name", max_distance=1).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["__dist"] == 9  # caller's column untouched
    assert row["__dist_1"] == 1  # computed distance landed in a fresh name
    import pytest as _pytest

    from spark_ensemble_spark.streaming.events import funnel_conversion

    with _pytest.raises(ValueError, match="sequence of names"):
        funnel_conversion(a.withColumnRenamed("name", "event_type"), "view")


def test_winnow_guarantee_and_edges(spark):
    """The winnowing guarantee (Schleimer et al. §3): any shared substring
    of length >= k + w - 1 normalized characters between two documents
    yields at least one SHARED selected fingerprint. Plus the degenerate
    tiers: < k chars -> no fingerprints; one-window minimum for short docs;
    fingerprints insensitive to case/punctuation/whitespace."""
    from spark_ensemble_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "PREFIX AAA " + shared + " suffix one"),
        (2, "zzz unrelated lead-in " + shared + " tail!!!"),
        (3, "completely different content about spark shuffles"),
        (4, ""),            # no fingerprints
        (5, "ab"),          # < k normalized chars
        (6, "a b, C!d"),    # 4 normalized chars < k=5
        (7, "abcde"),       # exactly one k-gram -> one fingerprint
        (8, "The Quick-Brown FOX jumps OVER the lazy dog"),  # = shared, renormalized
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    assert len(shared.replace(" ", "")) >= WINNOW_K + WINNOW_W - 1
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert fps[4] == set() and fps[5] == set() and fps[6] == set()
    assert fps[9] == set()
    assert len(fps[7]) == 1
    # normalization: doc 8 is doc-text 'shared' modulo case/punct/space —
    # its fingerprint set equals the standalone fingerprints of `shared`
    shared_only = spark.createDataFrame([(0, shared)], "doc_id int, text string")
    shared_fps = set(
        shared_only.select(winnow_fingerprints(F.col("text")).alias("f"))
        .collect()[0]
        .f
    )
    assert fps[8] == shared_fps


def test_winnow_dup_pairs_planted_and_cap(spark):
    """Planted near-identical docs pair; unrelated docs don't; a
    boilerplate fingerprint occurring in more than max_fp_docs documents is
    quarantined (cap -> the pair signal it would have carried vanishes)."""
    from spark_ensemble_spark.operators.dedup import winnow_dup_pairs

    body = "spark ensemble methods bagging boosting stacking gradient trees"
    rows = [(i, f"unique preamble {i} zz " + body) for i in range(6)]
    rows += [(100, "totally unrelated text about parquet file footers today")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # every pair of the 6 planted docs shares the long body
    out = winnow_dup_pairs(df, min_shared=5, max_fp_docs=None).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert all(a < b for a, b in pairs)
    assert {(a, b) for a in range(6) for b in range(a + 1, 6)} <= pairs
    assert not any(100 in p for p in pairs)
    # cap: the shared-body fingerprints occur in 6 docs; max_fp_docs=5
    # quarantines them all -> no pair survives min_shared
    capped = winnow_dup_pairs(df, min_shared=5, max_fp_docs=5).collect()
    assert capped == []


def test_bm25_hand_values_and_pruning(spark):
    """BM25 scores match a plain-python replay of the formula on a
    hand-sized corpus; ranking is (score desc, doc_id asc); empty docs
    count in N and avgdl but never match; max_df prunes a term's whole
    posting list; a no-match query returns no rows."""
    import math

    from spark_ensemble_spark.operators.retrieval import bm25_topk

    corpus = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "cherry cherry cherry durian",
        4: "",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id int, text string")
    qs = spark.createDataFrame(
        [("qa", "apple cherry"), ("qm", "nothinghere")],
        "query_id string, query_text string",
    )
    out = {
        (r.query_id, r.doc_id): (float(r.score_micro) / 1e6, r.rank)
        for r in bm25_topk(docs, qs, k=10).collect()
    }

    toks = {d: t.split() for d, t in corpus.items()}
    n, sdl = len(toks), sum(len(v) for v in toks.values())

    def expected(q, d):
        s = 0.0
        for t in set(q.split()):
            tf = toks[d].count(t)
            df = sum(1 for v in toks.values() if t in v)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            dlr = (len(toks[d]) * n) / sdl
            s += round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dlr)), 6)
        return round(s, 6)

    assert set(out) == {("qa", 1), ("qa", 2), ("qa", 3)}  # qm: no rows
    for d in (1, 2, 3):
        assert out[("qa", d)][0] == expected("apple cherry", d)
    assert [d for (q, d), (_, r) in sorted(out.items(), key=lambda kv: kv[1][1])] == [1, 3, 2]

    # max_df=1 prunes cherry (df=2): only apple survives -> only doc 1
    pruned = bm25_topk(docs, qs, k=10, max_df=1).collect()
    assert [(r.query_id, r.doc_id, r.rank) for r in pruned] == [("qa", 1, 1)]


def test_bm25_tie_break_and_k(spark):
    """Identical docs tie on score -> doc_id ascending breaks the tie, and
    k truncates the ranking deterministically."""
    from spark_ensemble_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(10, "same words here"), (2, "same words here"), (7, "same words here")],
        "doc_id int, text string",
    )
    qs = spark.createDataFrame([("q", "words")], "query_id string, query_text string")
    out = bm25_topk(docs, qs, k=2).collect()
    assert [(r.doc_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        (2, 1),
        (7, 2),
    ]


def test_rrf_fuse_hand_values(spark):
    """RRF scores match Σ 1/(c+rank) by hand; docs in both lists beat
    docs in one; tie-break by doc id; needs >= 2 rankings."""
    import pytest as _pytest

    from spark_ensemble_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id int, rank int",
    )
    b = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)], "query_id string, doc_id int, rank int"
    )
    out = {
        r.doc_id: (float(r.rrf_score_nano) / 1e9, r.n_lists, r.rank)
        for r in rrf_fuse([a, b], k=10, c=60).collect()
    }
    exp = {
        2: round(1 / 62, 9) + round(1 / 61, 9),
        1: round(1 / 61, 9),
        4: round(1 / 62, 9),
        3: round(1 / 63, 9),
    }
    assert set(out) == set(exp)
    for d, s in exp.items():
        assert abs(out[d][0] - s) < 1e-12
    assert out[2][1] == 2 and out[1][1] == 1
    # rank order: doc2 (both lists) first; doc1 (1/61) then doc4 (1/62) then doc3
    assert [d for d, v in sorted(out.items(), key=lambda kv: kv[1][2])] == [2, 1, 4, 3]

    with _pytest.raises(ValueError, match="at least two"):
        rrf_fuse([a])


def test_bm25_alert_stream_equals_batch(spark, sf_dir):
    """The frozen-stats BM25 scoring projection emits IDENTICAL rows on
    the document stream and on the batch frame (stateless seam parity),
    and the compiled model's scores agree with bm25_topk's corpus scoring
    on the same corpus (same idf/stats, unranked)."""
    from spark_ensemble_spark.operators.retrieval import (
        bm25_query_model,
        bm25_topk,
    )
    from spark_ensemble_spark.sources.datasets import load_table
    from spark_ensemble_spark.streaming.corpus import (
        bm25_alert_stream,
        streaming_bm25_alerts,
    )

    qrows = [("q1", "spark window join"), ("q2", "hash scan")]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model, n, sdl = bm25_query_model(
        docs, spark.createDataFrame(qrows, "query_id string, query_text string")
    )
    batch = {
        (r.doc_id, r.query_id): r.score_micro
        for r in bm25_alert_stream(docs, model, n, sdl).collect()
    }
    streamed = {
        (r.doc_id, r.query_id): r.score_micro
        for r in streaming_bm25_alerts(spark, sf_dir, qrows).collect()
    }
    assert streamed == batch and batch
    # agree with the corpus-side scorer (k large enough to keep every match)
    qdf = spark.createDataFrame(qrows, "query_id string, query_text string")
    full = {
        (r.doc_id, r.query_id): r.score_micro
        for r in bm25_topk(docs, qdf, k=10**9).collect()
    }
    assert batch == full


def test_bm25_conjunctive_and_merge_index(spark):
    """require_all_terms keeps only docs matching every effective query
    term; merging a delivery into an index serves the same results as an
    index rebuilt from the full corpus."""
    from spark_ensemble_spark.operators.retrieval import (
        bm25_topk,
        build_bm25_index,
        merge_bm25_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana"),
            (3, "apple durian"),
            (4, "banana cherry"),
        ],
        "doc_id int, text string",
    )
    qs = spark.createDataFrame(
        [("q", "apple banana")], "query_id string, query_text string"
    )
    loose = {r.doc_id for r in bm25_topk(docs, qs, k=10).collect()}
    strict = {
        r.doc_id for r in bm25_topk(docs, qs, k=10, require_all_terms=True).collect()
    }
    assert loose == {1, 2, 3, 4}
    assert strict == {1, 2}

    old, new = docs.filter(F.col("doc_id") <= 2), docs.filter(F.col("doc_id") > 2)
    idx0, st0 = build_bm25_index(old)
    idx1, st1 = merge_bm25_index(idx0, st0, new)
    merged = {
        (r.query_id, r.doc_id): (r.score_micro, r.rank)
        for r in bm25_topk(None, qs, k=10, index=idx1, index_stats=st1).collect()
    }
    full_idx, full_st = build_bm25_index(docs)
    rebuilt = {
        (r.query_id, r.doc_id): (r.score_micro, r.rank)
        for r in bm25_topk(
            None, qs, k=10, index=full_idx, index_stats=full_st
        ).collect()
    }
    assert merged == rebuilt and merged


def test_bm25_remove_equals_rebuild(spark):
    """Tombstone maintenance: serving from an index after
    remove_from_bm25_index equals an index rebuilt from the post-delete
    corpus — including the stats decrement for a removed EMPTY document,
    which holds no posting row but was counted in n_docs."""
    from spark_ensemble_spark.operators.retrieval import (
        bm25_topk,
        build_bm25_index,
        remove_from_bm25_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana"),
            (3, "apple durian"),
            (4, "banana cherry"),
            (5, ""),  # empty doc: in n_docs, no postings
        ],
        "doc_id int, text string",
    )
    qs = spark.createDataFrame(
        [("q", "apple banana")], "query_id string, query_text string"
    )
    idx, st = build_bm25_index(docs)
    removed = docs.filter(F.col("doc_id").isin(2, 5)).select("doc_id", "text")
    idx2, st2 = remove_from_bm25_index(idx, st, removed)
    served = {
        (r.query_id, r.doc_id): (r.score_micro, r.rank)
        for r in bm25_topk(None, qs, k=10, index=idx2, index_stats=st2).collect()
    }
    fidx, fst = build_bm25_index(docs.filter(~F.col("doc_id").isin(2, 5)))
    rebuilt = {
        (r.query_id, r.doc_id): (r.score_micro, r.rank)
        for r in bm25_topk(None, qs, k=10, index=fidx, index_stats=fst).collect()
    }
    assert served == rebuilt and served
    # the empty doc's removal reached the stats (n_docs 5 → 3)
    assert st2.collect()[0]["n_docs"] == 3

    # an EMPTY wave must be a no-op, not a NULL-poisoning of sum_dl
    empty = docs.filter(F.lit(False)).select("doc_id", "text")
    _, st3 = remove_from_bm25_index(idx, st, empty)
    r3 = st3.collect()[0]
    r0 = st.collect()[0]
    assert (r3["n_docs"], r3["sum_dl"]) == (r0["n_docs"], r0["sum_dl"])

    # a wave that re-delivers the same (id, text) row twice decrements once
    dup_wave = removed.unionAll(removed)
    _, st4 = remove_from_bm25_index(idx, st, dup_wave)
    assert st4.collect()[0]["n_docs"] == 3


def test_ann_remove_equals_reencode(spark, sf_dir):
    """remove_from_ann_index(encode(all), wave) == encode(all − wave):
    frozen quantizers make the constructions identical row-for-row."""
    from spark_ensemble_spark.operators.similarity import (
        ivf_fixed_centroids,
        ivfpq_encode,
        pq_fixed_codebooks,
        remove_from_ann_index,
    )
    from spark_ensemble_spark.sources.datasets import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_fixed_centroids(dim=64, num_clusters=8)
    books = pq_fixed_codebooks(dim=64, num_subspaces=8, num_codewords=16)
    enc = ivfpq_encode(emb, cents, books, residual=True)
    removed = emb.filter(F.col("vec_id") % 4 == 1).select("vec_id")
    maintained = sorted(
        map(tuple, remove_from_ann_index(enc, removed).collect())
    )
    rebuilt = sorted(
        map(
            tuple,
            ivfpq_encode(
                emb.filter(F.col("vec_id") % 4 != 1), cents, books, residual=True
            ).collect(),
        )
    )
    assert maintained == rebuilt and len(maintained) > 0


def test_hybrid_retrieval_serving_shape_end_to_end(spark):
    """The PRODUCTION hybrid-retrieval composition the rrf_fuse docstring
    promises (r7 VERDICT #5): persisted BM25 index as the lexical branch,
    residual IVF-PQ as the semantic branch, fused with reciprocal-rank
    fusion. Planted fixture: per query, 3 relevant docs are findable ONLY
    lexically (share the query's rare terms, orthogonal embeddings) and 3
    ONLY semantically (near-identical embeddings, unrelated text), so each
    single branch caps at recall 1/2 and only the fusion reaches the full
    relevant set. Asserts (a) the persisted-index lexical branch serves
    bit-identical scores/ranks to inline bm25_topk, and (b) fused recall@6
    via ann_recall strictly beats BOTH branches on every query. No stage
    here touches a corpus-sized frame after the two branch top-ks — fusion
    is O(k·|queries|·2) rows by construction."""
    from spark_ensemble_spark.operators.retrieval import (
        bm25_topk,
        build_bm25_index,
        rrf_fuse,
    )
    from spark_ensemble_spark.operators.similarity import (
        ann_recall,
        ivf_fixed_centroids,
        ivfpq_topk,
        pq_train_codebooks,
    )

    DIM, K = 8, 6

    def one_hot(axis, scale=1.0):
        v = [0.0] * DIM
        v[axis] = scale
        return v

    def near(axis, j):
        v = one_hot(axis)
        v[(axis + 2 + j) % DIM] = 0.02 * (j + 1)
        return v

    rows = []
    # noise: low ids win distance ties so the semantic branch cannot
    # accidentally surface lexical-planted docs through the tie-break
    for i in range(1, 21):
        rows.append((i, f"filler common words body {i}", one_hot(2 + i % 6)))
    lex_text = {0: "zebra quartz marker", 1: "umbra gneiss marker"}
    for q in (0, 1):
        for j in range(3):
            rows.append((101 + 10 * q + j, lex_text[q] + f" extra{j}", one_hot(2 + j)))
            rows.append((104 + 10 * q + j, "lorem ipsum dolor unrelated", near(q, j)))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id int, text string"
    )
    emb = spark.createDataFrame(
        [(i, v) for i, _, v in rows], "vec_id int, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(9001, "zebra quartz"), (9002, "umbra gneiss")],
        "query_id int, query_text string",
    )
    qemb = spark.createDataFrame(
        [(9001, one_hot(0)), (9002, one_hot(1))],
        "vec_id int, embedding array<double>",
    )
    relevant = {
        9001: {101, 102, 103, 104, 105, 106},
        9002: {111, 112, 113, 114, 115, 116},
    }

    # lexical branch: persisted-index serving == inline analytics
    idx, st = build_bm25_index(docs)
    lex = bm25_topk(None, queries, k=K, index=idx, index_stats=st)
    inline = bm25_topk(docs, queries, k=K)
    assert {
        (r.query_id, r.doc_id): (r.score_micro, r.rank) for r in lex.collect()
    } == {
        (r.query_id, r.doc_id): (r.score_micro, r.rank)
        for r in inline.collect()
    }

    # semantic branch: residual IVF-PQ with trained codebooks
    cents = ivf_fixed_centroids(DIM, 4, seed=23)
    books = pq_train_codebooks(emb, DIM, num_subspaces=4, num_codewords=8)
    sem = ivfpq_topk(
        emb, qemb, cents, books, k=K, nprobe=3, residual=True
    )

    fused = rrf_fuse(
        [
            lex.select("query_id", "doc_id", "rank"),
            sem.select(
                "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
            ),
        ],
        k=K,
    )

    truth = spark.createDataFrame(
        [
            (qid, d, r + 1)
            for qid, ds in relevant.items()
            for r, d in enumerate(sorted(ds))
        ],
        "query_id int, neighbor_id int, rank int",
    )

    def recall_by_q(approx):
        return {
            r.query_id: r.recall for r in ann_recall(approx, truth, K).collect()
        }

    r_lex = recall_by_q(lex.select("query_id", F.col("doc_id").alias("neighbor_id"), "rank"))
    r_sem = recall_by_q(sem.select("query_id", "neighbor_id", "rank"))
    r_fused = recall_by_q(
        fused.select("query_id", F.col("doc_id").alias("neighbor_id"), "rank")
    )
    for qid in relevant:
        assert r_lex[qid] <= 0.5, (qid, r_lex)      # lexical finds only its 3
        assert r_sem[qid] <= 0.5, (qid, r_sem)      # semantic finds only its 3
        assert r_fused[qid] > max(r_lex[qid], r_sem[qid]), (qid, r_lex, r_sem, r_fused)
        assert r_fused[qid] == 1.0, (qid, r_fused)  # fusion recovers all 6


def test_rrf_fuse_weights_tilt_and_default_identity(spark):
    """Weighted RRF: default weights equal explicit all-ones; a discounted
    list's exclusive candidates drop below an equally-ranked candidate of
    the full-weight list."""
    from spark_ensemble_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query_id string, doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [("q", 3, 1), ("q", 4, 2)], "query_id string, doc_id int, rank int"
    )
    plain = {
        (r.doc_id): (r.rrf_score_nano, r.rank)
        for r in rrf_fuse([a, b], k=4).collect()
    }
    ones = {
        (r.doc_id): (r.rrf_score_nano, r.rank)
        for r in rrf_fuse([a, b], k=4, weights=(1.0, 1.0)).collect()
    }
    assert plain == ones
    # equal ranks tie in unweighted fusion (1 and 3 both rank-1; id breaks
    # the tie); with b discounted, a's candidates strictly outrank b's
    tilted = sorted(
        (r.rank, r.doc_id)
        for r in rrf_fuse([a, b], k=4, weights=(1.0, 0.5)).collect()
    )
    assert [d for _, d in tilted] == [1, 2, 3, 4]


def test_gzip_container_roundtrip_and_member_walk(spark):
    """Multi-member gzip JSONL containers: pack → extract is identity on
    every record (unicode, embedded newlines, empty text), member/line
    provenance follows the 5-line member layout, and trailing non-gzip
    bytes stop the walker at the garbage instead of corrupting records."""
    from spark_ensemble_spark.sources.compressed import (
        _LINES_PER_MEMBER,
        gzip_extract_jsonl,
        synthetic_jsonl_gz_corpus,
    )

    rows = [(i, f"doc {i} body") for i in range(12)]
    rows[3] = (3, "")  # empty text
    rows[5] = (5, "line one\nline two\ttabbed")  # raw newline inside a record
    rows[7] = (7, "unicode: ünïcødé ✓ 中文")
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    packed = synthetic_jsonl_gz_corpus(docs, num_containers=2)
    pk = {r.container_id: r for r in packed.collect()}
    assert set(pk) == {0, 1} and all(p.n_records == 6 for p in pk.values())
    # 6 records per container at 5 lines/member → exactly 2 members each
    assert all(p.payload.startswith(b"\x1f\x8b") for p in pk.values())

    rec = gzip_extract_jsonl(packed)
    got = {r.doc_id: r for r in rec.collect()}
    assert {i for i in got} == {i for i, _ in rows}
    for i, t in rows:
        r = got[i]
        assert r.text == t, (i, r.text)
        assert r.container_id == i % 2
        idx = sorted(j for j, _ in rows if j % 2 == i % 2).index(i)
        assert (r.member_index, r.line_index) == (
            idx // _LINES_PER_MEMBER,
            idx % _LINES_PER_MEMBER,
        )

    # trailing garbage after the last member: records before it survive
    import pandas as pd

    garbage = packed.sparkSession.createDataFrame(
        pd.DataFrame(
            {
                "container_id": [9],
                "payload": [pk[0].payload + b"NOT-GZIP-TRAILER"],
            }
        ),
        "container_id long, payload binary",
    )
    out = gzip_extract_jsonl(garbage).collect()
    assert sorted(r.doc_id for r in out) == sorted(
        i for i, _ in rows if i % 2 == 0
    )


def test_jpeg_roundtrip_nonconstant_blocks_and_guards(spark):
    """Baseline JPEG codec honesty on NON-constant blocks (real AC
    coefficients — run-length, EOB, magnitude bits, full IDCT): the Spark
    decoder's output must equal an independent numpy reference that
    re-derives the quantized coefficients and reconstructs them. Also pins
    byte stuffing actually occurring in the corpus and the decoder's
    unsupported-variant guards."""
    import numpy as np

    from spark_ensemble_spark.operators import multimodal as mm

    rng = np.random.RandomState(5)
    bw, bh = 2, 1
    comps = [
        [[rng.randint(0, 256, (8, 8)).astype(np.uint8) for _ in range(bw)]
         for _ in range(bh)]
        for _ in range(3)
    ]
    payload = mm._jpeg_encode(comps, bw, bh)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"

    # independent reference: re-quantize with the encoder's math, then
    # reconstruct with the decoder's documented rounding
    zz = mm._jpeg_zigzag()
    u = np.arange(8)
    M = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16)
    M[0, :] = 1.0
    M *= np.where(u[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    qts = [
        np.array(mm._JPEG_QT_LUMA, float)[mm._zz_inv_index()].reshape(8, 8),
        np.array(mm._JPEG_QT_CHROMA, float)[mm._zz_inv_index()].reshape(8, 8),
    ]
    planes = []
    for ci in range(3):
        plane = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                blk = comps[ci][by][bx].astype(float) - 128.0
                coef = M @ blk @ M.T
                q = np.floor(
                    np.floor((coef / qts[min(ci, 1)]) * 1e9 + 0.5) / 1e9 + 0.5
                )
                rec = M.T @ (q * qts[min(ci, 1)]) @ M + 128.0
                rec = np.floor(np.floor(rec * 1e9 + 0.5) / 1e9 + 0.5)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rec
        planes.append(np.clip(plane, 0, 255))
    yv, cb, cr = planes
    r = np.clip(np.floor(yv + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(
        np.floor(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5),
        0,
        255,
    )
    b = np.clip(np.floor(yv + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    n = float(bw * 8 * bh * 8)
    expect = (
        bw * 8, bh * 8, float(r.sum()) / n, float(g.sum()) / n,
        float(b.sum()) / n, int(r[0, 0]),
    )

    pdf = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    got = mm.decode_jpeg(pdf).collect()[0]
    assert (
        got.width, got.height, got.mean_r, got.mean_g, got.mean_b, got.top_left_r
    ) == expect

    # byte stuffing: find a seed whose scan emits a 0xFF byte, decode THAT
    # payload too (unstuffing must not corrupt the stream)
    stuffed = None
    for seed in range(200):
        r2 = np.random.RandomState(seed)
        c2 = [
            [[r2.randint(0, 256, (8, 8)).astype(np.uint8)]] for _ in range(3)
        ]
        p2 = mm._jpeg_encode(c2, 1, 1)
        if b"\xff\x00" in p2.split(b"\xff\xda")[1][:-2]:
            stuffed = p2
            break
    assert stuffed is not None, "no stuffed payload in 200 seeds"
    sdf = spark.createDataFrame(
        [(1, bytearray(stuffed))], "doc_id long, payload binary"
    )
    srow = mm.decode_jpeg(sdf).collect()[0]
    assert (srow.width, srow.height) == (8, 8) and 0 <= srow.top_left_r <= 255

    # guards: progressive SOF and subsampled components raise, not mis-decode
    import pytest as _pytest

    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    bad1 = spark.createDataFrame([(1, bytearray(prog))], "doc_id long, payload binary")
    with _pytest.raises(Exception, match="(?i)non-baseline|unsupported"):
        mm.decode_jpeg(bad1).collect()
    i = payload.index(b"\xff\xc0")
    sub = bytearray(payload)
    sub[i + 11] = 0x22  # Y component Hi/Vi = 2,2
    bad2 = spark.createDataFrame([(1, bytes(sub))], "doc_id long, payload binary")
    with _pytest.raises(Exception, match="(?i)subsampling|unsupported"):
        mm.decode_jpeg(bad2).collect()


def test_mmr_rerank_diversifies_planted_near_dups(spark):
    """MMR behavior on a planted fixture: the shortlist's top hits are
    near-duplicates of each other; plain relevance order picks the clones
    back-to-back, while MMR (λ=0.7) interleaves the distinct candidate.
    Also pins the greedy reference: the Spark loop must equal a plain
    python greedy MMR on the same rounded scores."""
    import math

    from spark_ensemble_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # query 0; candidates: 1,2 = near-identical clones close to q;
    # 3 = distinct direction, slightly less relevant; 4 = filler
    rows = [
        (0, unit([1.0, 0.0, 0.0, 0.05])),
        (1, unit([0.98, 0.1, 0.0, 0.05])),
        (2, unit([0.985, 0.098, 0.0, 0.05])),
        (3, unit([0.8, -0.55, 0.2, 0.0])),
        (4, unit([0.1, 0.9, 0.4, 0.0])),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qdf = emb.filter(F.col("vec_id") == 0)
    sl = brute_force_topk(emb, qdf, k=4)
    out = sorted(
        (r.mmr_rank, r.neighbor_id)
        for r in mmr_rerank(emb, qdf, sl, k=3, lam=0.5).collect()
    )
    order = [n for _, n in out]
    # relevance order is 2,1,3(,4); MMR must break up the 1/2 clone pair
    assert order[0] in (1, 2)
    assert order[1] == 3, order

    # python greedy reference on the same rounded arithmetic
    def fr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def cos(a, b):
        d = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / d

    vecs = dict(rows)
    cands = {i: fr(cos(vecs[i], vecs[0])) for i in (1, 2, 3, 4)}
    sel, rem = [], dict(cands)
    for _ in range(3):
        best = None
        for i, rel in sorted(rem.items()):
            pen = max((fr(cos(vecs[i], vecs[s])) for s in sel), default=None)
            mmr = fr(0.5 * rel) if pen is None else fr(0.5 * rel - 0.5 * pen)
            if best is None or mmr > best[1]:
                best = (i, mmr)
        sel.append(best[0])
        del rem[best[0]]
    assert order == sel, (order, sel)


# ---------------------------------------------------------------------------
# PII detection + redaction (operators/pii.py)
# ---------------------------------------------------------------------------


def test_pii_patterns_cross_engine(spark):
    """Each rule's Java-regex (Spark) and RE2 (DuckDB) behavior must agree
    on adversarial fixtures — overlapping digit runs, boundary cases, and
    the ambiguity-prone optional phone prefix (leftmost-first semantics)."""
    import duckdb

    from spark_ensemble_spark.operators.pii import PII_RULES

    fixtures = [
        "mail bob.smith+x@ex-ample.co.uk end",
        "a@b.co a@b.c a@@b.com user@host",  # minimal / invalid emails
        "call 555-123-4567 or +1 (212) 555-0199 or (900) 111 2222",
        "phone inside 1234567890123 digits",
        "ip 192.168.1.254 and 999.999.999.999 and 1.2.3.4567",
        "ssn 123-45-6789 not 1234-45-6789 nor 123-456-6789",
        "card 4111 1111 1111 1111 and 4111-1111-1111-1111 and 41111111111111112",
        "mixed u7@host0.example.com (100) 107-1091 from 7.21.35.77",
        "adversarial 12-34 123-45 123-45-678 123-45-67890 tail",
        "+12 345-678-9012 +1.415.555.2671 .415.555.2671",
    ]
    con = duckdb.connect()
    df = spark.createDataFrame([(s,) for s in fixtures], "s string")
    for name, pat, token in PII_RULES:
        got_spark = [
            (r[0], r[1])
            for r in df.select(
                F.regexp_count("s", F.lit(pat)),
                F.regexp_replace("s", pat, token),
            ).collect()
        ]
        p = pat.replace("'", "''")
        got_duck = [
            con.execute(
                f"SELECT len(regexp_extract_all(?, '{p}')), "
                f"regexp_replace(?, '{p}', '{token}', 'g')",
                [s, s],
            ).fetchone()
            for s in fixtures
        ]
        assert got_spark == [tuple(r) for r in got_duck], name


def test_pii_scrub_redacts_everything(spark):
    """After the sequential fold no rule matches the redacted text, every
    doc_id divisible by a rule's modulus reports that rule's count >= 1,
    and totals add up."""
    import re

    from spark_ensemble_spark.operators.pii import (
        PII_RULES,
        inject_pii,
        scrub_pii,
    )

    docs = spark.createDataFrame(
        [(i, "plain words only here") for i in range(120)], "doc_id long, text string"
    )
    out = scrub_pii(inject_pii(docs)).collect()
    mods = {"email": 3, "credit_card": 13, "ssn": 11, "phone": 5, "ipv4": 7}
    for r in out:
        for name, pat, _ in PII_RULES:
            assert not re.search(pat, r.redacted), (r.doc_id, name, r.redacted)
            if r.doc_id % mods[name] == 0:
                assert r[f"n_{name}"] >= 1, (r.doc_id, name, r.redacted)
        assert r.n_pii == sum(r[f"n_{n}"] for n, _, _ in PII_RULES)
    # doc 0 carries all five spans; a plain doc carries none
    r0 = next(r for r in out if r.doc_id == 0)
    assert all(r0[f"n_{n}"] >= 1 for n, _, _ in PII_RULES)
    r1 = next(r for r in out if r.doc_id == 1)
    assert r1.n_pii == 0 and r1.redacted == "plain words only here"


# ---------------------------------------------------------------------------
# Learning-to-rank (operators/ltr.py)
# ---------------------------------------------------------------------------


def test_ltr_train_recovers_planted_weights(spark):
    """Labels generated by an exact on-grid linear model are recovered to
    grid precision, and the exact-sum fit is invariant under
    repartitioning (order-insensitive integer aggregation)."""
    import pytest

    from spark_ensemble_spark.operators.ltr import ltr_train_weights

    w1, w2, c = 0.3, 1.5, -0.25
    rows = []
    for i in range(200):
        x1 = (i * 37) % 1000 / 1000.0          # on the 1e-6 grid
        x2 = ((i * i) % 400 - 200) / 200.0
        y = w1 * x1 + w2 * x2 + c              # exact in binary? not quite —
        rows.append((int(x1 * 10**6), int(round(x2 * 10**6)), y))
    df = spark.createDataFrame(rows, "x_bm25 long, x_cos long, label double")
    got = ltr_train_weights(df)
    assert got == pytest.approx((w1, w2, c), abs=2e-6), got

    got2 = ltr_train_weights(df.repartition(13))
    assert got == got2, (got, got2)

    # constant feature -> singular normal equations must raise, not lie
    bad = spark.createDataFrame(
        [(5, 5, 1.0), (5, 5, 0.0)], "x_bm25 long, x_cos long, label double"
    )
    with pytest.raises(ValueError):
        ltr_train_weights(bad)


def test_ltr_score_matches_python_reference(spark):
    """The integer dot-product ranking equals an exact Python replay,
    including zero-fill for single-branch candidates."""
    from decimal import Decimal

    from spark_ensemble_spark.operators.ltr import ltr_features, ltr_score

    lex = spark.createDataFrame(
        [(1, 10, 2500000), (1, 11, 1250000), (2, 10, 500000)],
        "query_id long, doc_id long, score_micro long",
    )
    vec = spark.createDataFrame(
        [(1, 11, 0.9), (1, 12, 0.8), (2, 13, -0.5)],
        "query_id long, doc_id long, cosine double",
    )
    out = ltr_score(ltr_features(lex, vec), 0.25, 3.0, k=10).collect()
    got = {(r.query_id, r.doc_id): (r.ltr_score, r.rank) for r in out}
    wb, wc = 250000, 3000000
    expect = {}
    feats = {
        (1, 10): (2500000, 0),
        (1, 11): (1250000, 900000),
        (1, 12): (0, 800000),
        (2, 10): (500000, 0),
        (2, 13): (0, -500000),
    }
    for q in (1, 2):
        cands = {d: wb * f[0] + wc * f[1] for (qq, d), f in feats.items() if qq == q}
        for rank, (d, si) in enumerate(
            sorted(cands.items(), key=lambda kv: (-kv[1], kv[0])), start=1
        ):
            expect[(q, d)] = (si / 1e12, rank)
    assert got == expect, (got, expect)


def test_ltr_train_on_hybrid_features_end_to_end(spark, sf_dir):
    """The full LTR lifecycle on real retrieval features: build the hybrid
    candidate pool, derive a deterministic relevance label (candidate doc
    shares the query doc's lang), train, and rerank with the trained
    weights. The exact-sum trainer must be run-to-run AND
    partitioning-deterministic, and the trained model must rank
    same-lang candidates above different-lang ones better than chance
    (label signal actually flows into the weights)."""
    from spark_ensemble_spark.operators.ltr import (
        ltr_features,
        ltr_score,
        ltr_train_weights,
    )
    from spark_ensemble_spark.operators.retrieval import bm25_topk
    from spark_ensemble_spark.operators.similarity import brute_force_topk
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    lex = bm25_topk(docs, queries, k=8, exclude_self=True).select(
        "query_id", "doc_id", "score_micro"
    )
    vec = brute_force_topk(emb, emb.filter(F.col("vec_id") < 6), k=8).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "cosine"
    )
    feats = ltr_features(lex, vec)
    lang = docs.select("doc_id", "lang")
    qlang = lang.select(
        F.col("doc_id").alias("query_id"), F.col("lang").alias("qlang")
    )
    labeled = (
        feats.join(lang, "doc_id")
        .join(qlang, "query_id")
        .withColumn("label", (F.col("lang") == F.col("qlang")).cast("double"))
    )
    w = ltr_train_weights(labeled)
    assert w == ltr_train_weights(labeled.repartition(7)), "not deterministic"

    ranked = ltr_score(feats, w[0], w[1], k=8)
    j = (
        ranked.join(lang, "doc_id")
        .join(qlang, "query_id")
        .withColumn("match", (F.col("lang") == F.col("qlang")).cast("double"))
    )
    top = j.filter(F.col("rank") <= 3).agg(F.avg("match")).collect()[0][0]
    base = labeled.agg(F.avg("label")).collect()[0][0]
    # trained top-3 must beat the candidate-pool base rate unless the pool
    # is already saturated (tiny-SF guard)
    assert top >= base or base > 0.95, (top, base)


def test_gap_fill_hourly_carry_forward(spark):
    """Hand-built grid: gaps carry the last observed hourly value, n_events
    zeroes on gap rows, single-bucket users emit exactly one row, and
    multi-event buckets sum exactly."""
    import datetime as dt

    from spark_ensemble_spark.streaming.events import gap_fill_hourly

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        (1, ts(0, 10), 1.5),
        (1, ts(0, 40), 2.25),   # same bucket: sums to 3.75
        (1, ts(3, 5), 7.0),     # hours 1-2 are gaps carrying 3.75
        (2, ts(5, 0), 4.0),     # single bucket
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.hour_start): (
            r.n_events,
            float(r.filled_value_micro) / 1e6,
            r.is_gap,
        )
        for r in gap_fill_hourly(df).collect()
    }
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[(1, base + 0 * 3600)] == (2, 3.75, 0)
    assert out[(1, base + 1 * 3600)] == (0, 3.75, 1)
    assert out[(1, base + 2 * 3600)] == (0, 3.75, 1)
    assert out[(1, base + 3 * 3600)] == (1, 7.0, 0)
    assert out[(2, base + 5 * 3600)] == (1, 4.0, 0)
    assert len(out) == 5


def test_ann_index_stream_accumulates_across_batches(spark, tmp_path):
    """The streaming IVF-PQ index must ACCUMULATE: two deliveries of corpus
    vectors land under distinct batch_id partitions, and a probe of the
    union index returns exactly what a from-scratch batch encode over the
    combined corpus returns."""
    import random

    from spark_ensemble_spark.operators.similarity import (
        ivf_fixed_centroids,
        ivfpq_encode,
        ivfpq_probe,
        pq_fixed_codebooks,
    )
    from spark_ensemble_spark.streaming.scoring import ann_index_stream

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(40)]
    cents = ivf_fixed_centroids(16, 4)
    books = pq_fixed_codebooks(16, num_subspaces=4, num_codewords=8, seed=9)
    src = tmp_path / "vec_src"
    src.mkdir()

    def deliver(name, rr):
        spark.createDataFrame(rr, "vec_id long, embedding array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    deliver("d1", rows[:25])
    stream = spark.readStream.schema("vec_id long, embedding array<double>").parquet(
        str(src) + "/*"
    )
    q = ann_index_stream(
        stream, cents, books,
        index_path=str(tmp_path / "idx"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        residual=True,
    )
    try:
        q.processAllAvailable()
        deliver("d2", rows[25:])
        q.processAllAvailable()
    finally:
        q.stop()

    enc = spark.read.parquet(str(tmp_path / "idx"))
    assert {r.batch_id for r in enc.select("batch_id").distinct().collect()} == {0, 1}
    full = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = full.filter(F.col("vec_id") < 3)
    served = ivfpq_probe(
        enc.select("neighbor_id", "cell", "codes"), queries, cents, books,
        k=5, nprobe=2, residual=True,
    )
    batch = ivfpq_probe(
        ivfpq_encode(full, cents, books, residual=True), queries, cents, books,
        k=5, nprobe=2, residual=True,
    )
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, batch.collect()))


def test_bm25_index_stream_accumulates_across_batches(spark, tmp_path):
    """Streaming lexical-index maintenance across two deliveries: the
    merged stats partials and union posting lists must serve EXACTLY what
    inline from-scratch BM25 over the combined corpus serves — df counts
    and length normalization included (both depend on the WHOLE corpus,
    so a stats-merge bug shows up in every score)."""
    from spark_ensemble_spark.operators.retrieval import bm25_topk
    from spark_ensemble_spark.streaming.corpus import (
        bm25_index_stream,
        read_bm25_index_dir,
    )

    d1 = [(1, "spark window join table"), (2, "hash scan merge spark")]
    d2 = [(3, "window window join stream"), (4, "batch scan scan spark join")]
    src = tmp_path / "docs_src"
    src.mkdir()

    def deliver(name, rr):
        spark.createDataFrame(rr, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    deliver("d1", d1)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src) + "/*"
    )
    q = bm25_index_stream(
        stream, index_path=str(tmp_path / "idx"), checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        deliver("d2", d2)
        q.processAllAvailable()
    finally:
        q.stop()

    postings, stats = read_bm25_index_dir(spark, str(tmp_path / "idx"))
    st = stats.collect()[0]
    assert (st.n_docs, st.sum_dl) == (4, 17)
    queries = spark.createDataFrame(
        [("qa", "spark join"), ("qb", "scan")], "query_id string, query_text string"
    )
    served = bm25_topk(None, queries, k=4, index=postings, index_stats=stats)
    full = spark.createDataFrame(d1 + d2, "doc_id long, text string")
    inline = bm25_topk(full, queries, k=4)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, inline.collect()))


def test_pagerank_matches_python_reference(spark):
    """Exact-integer PageRank equals an arbitrary-precision Python replay
    on a non-regular graph (hub, chain, dangling node), and is invariant
    under repartitioning."""
    from collections import Counter

    from spark_ensemble_spark.operators.graph import SCALE, pagerank

    ed = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 4), (4, 0), (5, 0)]
    edges = spark.createDataFrame(ed, "src long, dst long")
    got = {r.node: r.rank_scaled for r in pagerank(edges, n_iters=4).collect()}

    nodes = sorted({x for e in ed for x in e})
    n = len(nodes)
    init, base = SCALE // n, (3 * SCALE) // (20 * n)
    od = Counter(s for s, _ in ed)
    ranks = {v: init for v in nodes}
    for _ in range(4):
        S = Counter()
        for a, b in ed:
            S[b] += ranks[a] // od[a]
        ranks = {v: base + (S[v] * 17) // 20 for v in nodes}
    assert got == ranks, (got, ranks)

    got2 = {
        r.node: r.rank_scaled
        for r in pagerank(edges.repartition(7), n_iters=4).collect()
    }
    assert got2 == ranks
    # the hub (node 0) must outrank the dangling sink-free node 5
    assert got[0] > got[5]


def test_warc_parser_strictness_and_binary_payloads(spark):
    """WARC parsing edges: Content-Length framing must survive payloads
    containing CRLF-CRLF look-alikes (never 'read until next record'), a
    bad version line raises, and a truncated payload raises."""
    import gzip

    import pytest

    from spark_ensemble_spark.sources.compressed import warc_extract

    def rec(body: bytes, version=b"WARC/1.0", length=None):
        n = len(body) if length is None else length
        return (
            version + b"\r\n"
            + b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: https://x/1\r\n"
            + f"Content-Length: {n}\r\n".encode()
            + b"\r\n" + body + b"\r\n\r\n"
        )

    tricky = "a\r\n\r\nb"  # header-terminator bytes INSIDE the payload
    payload = gzip.compress(rec(tricky.encode()), mtime=0)
    df = spark.createDataFrame(
        [(1, payload)], "container_id long, payload binary"
    )
    out = warc_extract(df).collect()
    assert len(out) == 1 and out[0].text == tricky and out[0].content_length == 6

    bad_version = gzip.compress(rec(b"x", version=b"WARC/0.9"), mtime=0)
    with pytest.raises(Exception):
        warc_extract(
            spark.createDataFrame([(1, bad_version)], "container_id long, payload binary")
        ).collect()

    truncated = gzip.compress(rec(b"abc", length=10), mtime=0)
    with pytest.raises(Exception):
        warc_extract(
            spark.createDataFrame([(1, truncated)], "container_id long, payload binary")
        ).collect()


def test_phrase_topk_adjacency_and_overlap(spark):
    """Hand-built fixture pinning the phrase semantics that a bag-of-words
    ranker cannot express: adjacency (terms present but not consecutive do
    NOT match), overlapping occurrences (each start counted), repeated-token
    phrases, the all-miss query, and the doc-id tie-break."""
    from spark_ensemble_spark.operators.retrieval import phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "big table scan runs a table scan twice"),
            (2, "table of contents then a scan"),  # both terms, not adjacent
            (3, "batch batch batch"),  # "batch batch" overlaps: tf=2
            (4, "one table scan only"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [
            ("p_scan", "table scan"),
            ("p_rep", "batch batch"),
            ("p_one", "contents"),
            ("p_miss", "scan table"),  # reversed order: no match anywhere
        ],
        "query_id string, query_text string",
    )
    rows = phrase_topk(docs, qs, k=10).collect()
    got = {(r.query_id, r.doc_id): (r.phrase_tf, r.rank) for r in rows}
    assert got == {
        ("p_scan", 1): (2, 1),
        ("p_scan", 4): (1, 2),  # tie-break vs nothing; rank follows tf
        ("p_rep", 3): (2, 1),
        ("p_one", 2): (1, 1),
    }


def test_bm25_leveled_compaction_retained_guard(spark, tmp_path):
    """Leveled (keep_recent=1) compaction: the hot batch is carried
    verbatim, so a tombstone targeting it is RETAINED at batch_id=-1 —
    and a takedown stream on the new generation that RE-delivers the
    retained id must still be blocked by the cross-batch guard (-1 < 0,
    the reserved level sorts below every fresh-checkpoint batch id).
    End state after re-delivery plus one genuinely new delete: serve ==
    rebuild on the corpus minus all three."""
    import os

    from spark_ensemble_spark.operators.retrieval import build_bm25_index
    from spark_ensemble_spark.streaming.corpus import (
        bm25_tombstone_stream,
        compact_bm25_index_dir,
        read_bm25_index_dir,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common tok{i}") for i in range(20)],
        "doc_id long, text string",
    )
    gen1, gen2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    for b, pred in ((0, F.col("doc_id") < 10), (1, F.col("doc_id") >= 10)):
        postings, stats = build_bm25_index(docs.filter(pred))
        postings.write.parquet(f"{gen1}/postings/batch_id={b}")
        stats.write.parquet(f"{gen1}/stats/batch_id={b}")
    removed = docs.filter(F.col("doc_id").isin([0, 15]))
    _, rem_stats = build_bm25_index(removed)
    removed.select("doc_id").write.parquet(f"{gen1}/tombstones/batch_id=0")
    rem_stats.select(
        (-F.col("n_docs")).alias("n_docs"), (-F.col("sum_dl")).alias("sum_dl")
    ).write.parquet(f"{gen1}/tombstone_stats/batch_id=0")

    compact_bm25_index_dir(spark, gen1, gen2, keep_recent=1)
    # cold level folded doc 0; hot batch verbatim; doc 15 retained
    assert os.path.isdir(f"{gen2}/postings/batch_id=-1")
    # hot copy remapped to the reserved negative band (-2, -3, ...): a
    # fresh append checkpoint's batch 0/1/... writes can never collide
    assert os.path.isdir(f"{gen2}/postings/batch_id=-2")
    assert not os.path.isdir(f"{gen2}/postings/batch_id=1")
    retained = spark.read.parquet(f"{gen2}/tombstones")
    assert [r.doc_id for r in retained.collect()] == [15]
    folded = spark.read.parquet(f"{gen2}/compacted_tombstones")
    assert [r.doc_id for r in folded.collect()] == [0]

    src = tmp_path / "wave"
    src.mkdir()
    docs.filter(F.col("doc_id").isin([15, 7])).coalesce(1).write.parquet(
        str(src / "f")
    )
    q = bm25_tombstone_stream(
        spark.readStream.schema("doc_id long, text string").parquet(
            str(src) + "/*"
        ),
        index_path=gen2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got_postings, got_stats = read_bm25_index_dir(spark, gen2)
    want_postings, want_stats = build_bm25_index(
        docs.filter(~F.col("doc_id").isin([0, 15, 7]))
    )
    assert got_stats.collect() == want_stats.collect()
    key = ["term", "doc_id", "tf", "dl"]
    assert sorted(map(tuple, got_postings.select(*key).collect())) == sorted(
        map(tuple, want_postings.select(*key).collect())
    )


def test_ann_leveled_compaction_retained_tombstones(spark, tmp_path):
    """ANN leveled compaction: cold codes fold, the hot batch copies
    verbatim, and a tombstone targeting the hot level must be retained at
    out_tombstone_path (refusing to compact without one — dropping it
    would resurrect the deleted vector)."""
    import os

    import pytest as _pytest

    from spark_ensemble_spark.streaming.scoring import (
        compact_ann_index_dir,
        read_ann_index_dir,
    )

    enc = spark.createDataFrame(
        [(i, i % 3, [i, i + 1]) for i in range(20)],
        "neighbor_id long, cell int, code array<int>",
    )
    idx = str(tmp_path / "idx")
    enc.filter(F.col("neighbor_id") < 10).write.parquet(f"{idx}/batch_id=0")
    enc.filter(F.col("neighbor_id") >= 10).write.parquet(f"{idx}/batch_id=1")
    tomb = str(tmp_path / "tomb")
    spark.createDataFrame([(1,), (11,)], "vec_id long").write.parquet(
        f"{tomb}/batch_id=0"
    )

    with _pytest.raises(ValueError):
        compact_ann_index_dir(
            spark, idx, tomb, str(tmp_path / "nope"), keep_recent=1
        )

    out, out_tomb = str(tmp_path / "out"), str(tmp_path / "out_tomb")
    compact_ann_index_dir(
        spark, idx, tomb, out, keep_recent=1, out_tombstone_path=out_tomb
    )
    assert os.path.isdir(f"{out}/batch_id=-1")
    # hot copy remapped to the reserved negative band (ADVICE r11)
    assert os.path.isdir(f"{out}/batch_id=-2")
    assert not os.path.isdir(f"{out}/batch_id=1")
    assert [r.vec_id for r in spark.read.parquet(out_tomb).collect()] == [11]
    got = read_ann_index_dir(spark, out, out_tomb)
    want = enc.filter(~F.col("neighbor_id").isin([1, 11]))
    key = ["neighbor_id", "cell"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )


def test_mmr_local_path_equals_distributed(spark, sf_dir, monkeypatch):
    """The driver-side MMR fast path (r12) must be bit-identical to the
    distributed greedy loop: same picks, scores, ranks, and schema."""
    from spark_ensemble_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )
    from spark_ensemble_spark.sources.datasets import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 5)
    sl = brute_force_topk(emb, qdf, k=15)
    monkeypatch.setenv("SPARK_GRAFT_MMR_LOCAL_CAND_MAX", "8192")
    local = mmr_rerank(emb, qdf, sl, k=5, lam=0.7)
    monkeypatch.setenv("SPARK_GRAFT_MMR_LOCAL_CAND_MAX", "0")
    dist = mmr_rerank(emb, qdf, sl, k=5, lam=0.7)
    assert local.columns == dist.columns
    assert [f.dataType for f in local.schema.fields] == [
        f.dataType for f in dist.schema.fields
    ]
    assert sorted(map(tuple, local.collect())) == sorted(
        map(tuple, dist.collect())
    )


def test_cc_local_path_equals_distributed(spark, monkeypatch):
    """The driver-side union-find fast path (r12) must produce the exact
    label set of the distributed min-label propagation, on a fixture with
    chains, a star, singleton edges, and string ids."""
    from spark_ensemble_spark.operators.dedup import dup_clusters

    def rows(df):
        return sorted(map(tuple, df.collect()))

    fixtures = [
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 1)],
            "id_a long, id_b long",
        ),
        spark.createDataFrame(
            [("a", "b"), ("c", "b"), ("d", "e"), ("x", "a")],
            "id_a string, id_b string",
        ),
    ]
    for pairs in fixtures:
        monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_EDGES_MAX", "65536")
        local = dup_clusters(pairs)
        monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_EDGES_MAX", "0")
        dist = dup_clusters(pairs)
        assert local.columns == dist.columns
        assert [f.dataType for f in local.schema.fields] == [
            f.dataType for f in dist.schema.fields
        ]
        assert rows(local) == rows(dist)


def test_pagerank_local_path_equals_distributed(spark, monkeypatch):
    """The driver-side PageRank fast path (r12) must be bit-identical to
    the distributed exact-integer loop, incl. dangling/no-inlink nodes."""
    from spark_ensemble_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0), (0, 2), (4, 3), (5, 0)],
        "src long, dst long",
    )
    monkeypatch.setenv("SPARK_GRAFT_PR_LOCAL_EDGES_MAX", "65536")
    local = pagerank(edges, n_iters=5)
    monkeypatch.setenv("SPARK_GRAFT_PR_LOCAL_EDGES_MAX", "0")
    dist = pagerank(edges, n_iters=5)
    assert local.columns == dist.columns
    assert [f.dataType for f in local.schema.fields] == [
        f.dataType for f in dist.schema.fields
    ]
    assert sorted(map(tuple, local.collect())) == sorted(
        map(tuple, dist.collect())
    )
