"""EXT operators: text analysis, dedup families, similarity search, multimodal."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from incremental_etl_on_lakehouse_spark.operators import dedup, multimodal, similarity, text
from incremental_etl_on_lakehouse_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).cache()


# ------------------------------------------------------------------- text


def test_token_stats(spark, docs):
    out = text.token_stats(docs)
    row = out.join(docs, "doc_id").where("doc_id = 0").collect()[0]
    assert row["n_tokens_ws"] == len(row["text"].split())
    assert row["n_tokens_bpe"] >= row["n_tokens_ws"]
    assert out.count() == docs.count()


def test_quality_score_bounds(docs):
    out = text.quality_score(docs)
    bad = out.where("quality_score < 0 or quality_score > 1").count()
    assert bad == 0
    assert out.where("n_stopwords > 0").count() > 0


def test_language_id_shape(docs):
    out = text.language_id(docs)
    assert out.count() == docs.count()
    assert set(r["lang_guess"] for r in out.collect()) <= set(text.LANG_PROFILES)


def test_fingerprint_deterministic(spark, docs):
    a = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    assert a == b
    # same normalized content -> same fingerprint
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = df.select(text.shingles(F.col("text"), 2).alias("s")).collect()[0]["s"]
    assert sorted(got) == ["a b", "b c", "c d"]
    short = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert short.select(text.shingles(F.col("text"), 3).alias("s")).collect()[0]["s"] == ["a"]


# ------------------------------------------------------------------ dedup


def test_dedup_exact(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    out = dedup.dedup_exact(df, ["text"])
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_minhash_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("field", "meadow")
    far = "completely unrelated content about spark shuffles and partitions at scale"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = dedup.minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    kept = dedup.dedup_minhash(df, jaccard_threshold=0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_simhash_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    df = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, "totally different words entirely")],
        "doc_id long, text string",
    )
    pairs = dedup.simhash_pairs(df, max_hamming=8).collect()
    ids = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (1, 2) in ids and (1, 3) not in ids


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    pairs = dedup.ngram_jaccard_pairs(df, shingle_k=2, threshold=0.1).collect()
    assert len(pairs) == 1
    # shingles: {ab,bc,cd,de} vs {ab,bc,cd,df}: inter 3, union 5
    assert abs(pairs[0]["jaccard"] - 0.6) < 1e-6


def test_embedding_dup_pairs(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.999, 0.001, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(1, v), (2, v2), (3, w)], "vec_id long, embedding array<float>"
    )
    pairs = dedup.embedding_dup_pairs(df, cosine_threshold=0.99).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


# -------------------------------------------------------------- similarity


def test_topk_bruteforce_matches_numpy(spark, embs):
    import numpy as np

    queries = embs.where("vec_id < 3")
    out = similarity.topk_cosine_bruteforce(queries, embs, k=5).collect()
    rows = embs.collect()
    mat = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    for qid in [0, 1, 2]:
        got = sorted(
            [(r["rank"], r["corpus_id"]) for r in out if r["query_id"] == qid]
        )
        q = mat[qid]
        sims = {
            cid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            for cid, v in mat.items()
            if cid != qid
        }
        expect = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:5]
        assert [cid for _, cid in got] == [cid for cid, _ in expect]


def test_topk_lsh_recall(spark, embs):
    queries = embs.where("vec_id < 10")
    exact = similarity.topk_cosine_bruteforce(queries, embs, k=3)
    approx = similarity.topk_cosine_lsh(queries, embs, k=3, planes=4, num_tables=10)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_normalize_vectors(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], "vec_id long, embedding array<float>")
    out = similarity.normalize_vectors(df).collect()[0]["embedding"]
    assert math.isclose(math.hypot(*out), 1.0, rel_tol=1e-6)


# -------------------------------------------------------------- multimodal


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", bytes([0x89, 0x50, 0x4E, 0x47]) + b"fakepngdata" * 100),
        (2, "image", bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"fakejpgdata" * 50),
        (3, "audio", b"RIFF" + b"fakewav" * 200),
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, content binary")
    meta = multimodal.attach_media_meta(df).collect()
    fmts = {r["media_id"]: r["sniffed_format"] for r in meta}
    assert fmts == {1: "png", 2: "jpeg", 3: "riff-wav"}
    assert all(r["n_bytes"] == len(rows[r["media_id"] - 1][2]) for r in meta)

    feats = multimodal.extract_features(df).collect()
    assert len(feats) == 3
    assert all(len(r["features"]) == 8 for r in feats)
    # deterministic fake decoder
    feats2 = multimodal.extract_features(df).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in feats2
    }

    frames = multimodal.sample_video_frames(df, every_nth_byte=256, max_frames=4)
    got = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in got)

    # the real-codec stub surfaces through Spark as a PythonException
    with pytest.raises(Exception, match="real image decoding"):
        multimodal.extract_features(df, decoder=multimodal.real_image_decoder).collect()


def test_topk_ivf_recall_and_shape(spark, embs):
    queries = embs.where("vec_id < 10")
    exact = similarity.topk_cosine_bruteforce(queries, embs, k=3)
    approx = similarity.topk_cosine_ivf(
        queries, embs, k=3, n_centroids=8, n_probe=4
    )
    rows = approx.collect()
    assert {r["query_id"] for r in rows} == set(range(10))
    assert all(1 <= r["rank"] <= 3 for r in rows)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # determinism: same fit, same result
    again = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.topk_cosine_ivf(
            queries, embs, k=3, n_centroids=8, n_probe=4
        ).collect()
    }
    assert a == again


def test_binary_file_source(spark, tmp_path):
    from incremental_etl_on_lakehouse_spark.sources.binary_source import (
        read_binary_dir,
        to_media_df,
    )

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(bytes([0x89, 0x50, 0x4E, 0x47]) + b"x" * 50)
    (d / "b.wav").write_bytes(b"RIFF" + b"y" * 30)
    (d / "notes.txt").write_text("not media")

    raw = read_binary_dir(spark, str(d))
    assert raw.count() == 3
    only_png = read_binary_dir(spark, str(d), glob="*.png")
    assert only_png.count() == 1

    media = to_media_df(raw)
    got = {r["file_name"]: (r["sniffed_format"], r["n_bytes"]) for r in media.collect()}
    assert got["a.png"] == ("png", 54)
    assert got["b.wav"] == ("riff-wav", 34)
    assert got["notes.txt"][0] == "unknown"
    # stable ids from path hash
    again = {r["file_name"]: r["media_id"] for r in to_media_df(raw).collect()}
    assert {r["file_name"]: r["media_id"] for r in media.collect()} == again


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_real_image_decoder_decodes_png():
    """When Pillow IS importable the real decode path must work end-to-end
    (r3 verdict #7: keep it from being dead code on machines that have it):
    encode a tiny 2x1 PNG, decode, check the 8-feature contract."""
    import io

    from PIL import Image

    im = Image.new("RGB", (2, 1))
    im.putdata([(255, 0, 0), (0, 0, 255)])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    feats = multimodal.real_image_decoder(buf.getvalue())
    assert len(feats) == 8
    assert feats[0] == 2.0 and feats[1] == 1.0  # width, height
    assert feats[2] == 3.0  # RGB bands
    assert feats[6] == 255.0 and feats[7] == 0.0  # channel extremes
    assert multimodal.default_image_decoder() is multimodal.real_image_decoder


@pytest.mark.skipif(_pil_available(), reason="Pillow installed")
def test_real_image_decoder_raises_clearly_without_pillow():
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.real_image_decoder(b"\x89PNG\r\n\x1a\n")
    # without Pillow the default is the auto decoder: REAL built-in PNG
    # decode, deterministic fake for other formats
    assert multimodal.default_image_decoder() is multimodal.auto_image_decoder


def test_repetition_metrics_hand_computed(spark):
    """Gopher repetition signals on hand-computable fixtures."""
    rows = [
        # 'a b c' twice + 'x y': 1 dup line (10 of 13 line chars), bigram
        # 'a b' and 'b c' both twice (4 chars) over 8 word chars
        (1, "a b c\na b c\nx y"),
        (2, "unique one\ntwo lines"),          # nothing repeats
        (3, "w w w w w w"),                     # one line, bigram 'w w' x5
        (4, ""),                                # degenerate: empty text
        (5, "solo"),                            # single word: no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from incremental_etl_on_lakehouse_spark.operators.text import (
        repetition_metrics,
    )

    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    assert got[1] == {
        "doc_id": 1, "n_lines": 3, "n_dup_lines": 1,
        "dup_line_chars": 10, "total_line_chars": 13,
        "top_bigram_chars": 4, "total_word_chars": 8,
        # dup-line frac 1/3 > 0.3 and bigram frac 4/8 > 0.2
        "gopher_flagged": True,
    }
    assert got[2]["gopher_flagged"] is False
    assert got[2]["n_dup_lines"] == 0 and got[2]["dup_line_chars"] == 0
    # 'w w' occurs 5 times, 2 chars each = 10 over 6 word chars -> flagged
    assert got[3]["top_bigram_chars"] == 10 and got[3]["gopher_flagged"] is True
    assert got[4] == {
        "doc_id": 4, "n_lines": 0, "n_dup_lines": 0, "dup_line_chars": 0,
        "total_line_chars": 0, "top_bigram_chars": 0, "total_word_chars": 0,
        "gopher_flagged": False,
    }
    assert got[5]["top_bigram_chars"] == 0 and got[5]["gopher_flagged"] is False


def test_chunk_documents_hand_computed(spark):
    """Sliding-window chunking on hand-computable fixtures: boundary
    placement, short-doc passthrough, and lossless stride reassembly."""
    rows = [
        (1, "t0 t1 t2 t3 t4 t5 t6"),   # 7 tokens, w=4 s=3 -> 2 chunks
        (2, "a b"),                     # shorter than a window -> 1 chunk
        (3, "x0 x1 x2 x3"),             # exactly one window -> 1 chunk
        (4, "y0 y1 y2 y3 y4"),          # 5 tokens -> 2 chunks, tail short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.chunk_documents(df, window=4, stride=3)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    }
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(2, 0)] == ("a b", 2)
    assert (3, 1) not in got and got[(3, 0)] == ("x0 x1 x2 x3", 4)
    assert got[(4, 0)] == ("y0 y1 y2 y3", 4)
    assert got[(4, 1)] == ("y3 y4", 2)
    # lossless: first `stride` tokens of each chunk + the last chunk's tail
    # reassemble the original token stream
    for doc_id, txt in rows:
        chunks = [
            got[(doc_id, i)][0].split()
            for i in range(max(ci for d, ci in got if d == doc_id) + 1)
        ]
        rebuilt = [t for c in chunks[:-1] for t in c[:3]] + chunks[-1]
        assert rebuilt == txt.split(), doc_id


def test_tfidf_topk_hand_computed(spark):
    """The corpus-wide stopword ranks below the document-distinctive term."""
    rows = [
        (1, "common common rare1"),
        (2, "common rare2 rare2 rare2"),
        (3, "common other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.tfidf_topk(df, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' appears in all 3 docs -> idf = ln(4/4)+1 = 1
    d1 = {r["term"]: r for r in by_doc[1]}
    assert d1["common"]["tf"] == 2 and d1["common"]["df"] == 3
    assert d1["common"]["tfidf"] == pytest.approx(2.0)
    assert d1["rare1"]["tfidf"] == pytest.approx(1 * (math.log(4 / 2) + 1), abs=1e-6)
    # rank 1 in doc 2 is the tripled rare term, not the stopword
    assert sorted(by_doc[2], key=lambda r: r["rank"])[0]["term"] == "rare2"
    # every doc emits at most k rows and ranks are 1..n contiguous
    for doc_id, rs in by_doc.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 3


def test_semantic_dedup_hand_computed(spark):
    """Greedy smallest-id SemDeDup on a hand-checkable fixture: two exact
    duplicate groups plus a singleton, one kmeans cluster (k=1)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.001]),   # ~dup of 0 (cosine ~ 1)
        (2, [0.0, 1.0]),     # orthogonal singleton
        (3, [0.0, 1.001]),   # ~dup of 2
        (4, [1.0, 0.002]),   # ~dup of 0 and 1
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["kept"] for r in similarity.semantic_dedup(
        df, k=1, threshold=0.99
    ).collect()}
    assert out == {0: True, 1: False, 2: True, 3: False, 4: False}


def test_semantic_dedup_real_embeddings_shape(spark, embs):
    out = similarity.semantic_dedup(embs, k=8, threshold=0.95)
    assert out.count() == embs.count()
    kept = out.where("kept").count()
    assert 0 < kept <= embs.count()


def test_unigram_lm_score_hand_computed(spark):
    """Cross-entropy on a 2-doc corpus small enough to compute by hand."""
    rows = [(1, "a a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.unigram_lm_score(df).collect()}
    # corpus: T=5 tokens, V=3 vocab; p(a)=(3+1)/8, p(b)=(1+1)/8, p(c)=(1+1)/8
    import math as m

    lp = lambda c: -m.log((c + 1) / 8.0)  # noqa: E731
    d1 = (lp(3) + lp(3) + lp(1)) / 3
    d2 = (lp(3) + lp(1)) / 2
    assert out[1]["n_tokens"] == 3
    assert out[1]["cross_entropy"] == pytest.approx(round(d1, 6), abs=2e-6)
    assert out[2]["cross_entropy"] == pytest.approx(round(d2, 6), abs=2e-6)
    # rarer-token doc is higher-entropy
    assert out[2]["cross_entropy"] > out[1]["cross_entropy"]
    assert out[1]["perplexity"] == pytest.approx(round(m.exp(d1), 2), abs=0.01)


def test_substring_dup_stats_hand_computed(spark):
    """12-gram cross-doc dup detection with k=3 grams on a tiny corpus."""
    rows = [
        (1, "a b c d e"),       # grams: abc bcd cde
        (2, "x y z a b c"),     # grams: xyz yza zab abc -> shares 'a b c'
        (3, "p q r s"),          # grams: pqr qrs — unique
        (4, "a b"),              # shorter than k: zero grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in dedup.substring_dup_stats(df, k=3).collect()}
    assert out[1] == {"doc_id": 1, "n_grams": 3, "n_dup_grams": 1, "flagged": True}
    assert out[2]["n_dup_grams"] == 1 and out[2]["flagged"] is True
    assert out[3] == {"doc_id": 3, "n_grams": 2, "n_dup_grams": 0, "flagged": False}
    assert out[4] == {"doc_id": 4, "n_grams": 0, "n_dup_grams": 0, "flagged": False}


def test_resize_images_fake(spark):
    """resize_images deterministic fake path: strided byte thumbnail."""
    from incremental_etl_on_lakehouse_spark.operators import multimodal as MM

    buf = bytes([0x89, 0x50, 0x4E, 0x47]) + b"fakepngdata" * 100
    df = spark.createDataFrame([(1, buf)], "media_id long, content binary")
    row = MM.resize_images(df, width=4, height=4).collect()[0]
    assert (row.out_w, row.out_h, len(row.pixels)) == (4, 4, 16)
    assert row.pixels == MM.fake_resize(buf, 4, 4)


def test_resize_images_real_when_pillow(spark):
    """Pillow-real resize path (skipped when Pillow is absent), proving the
    real resizer is not dead code on machines that have it."""
    from incremental_etl_on_lakehouse_spark.operators import multimodal as MM

    try:
        import io

        from PIL import Image
    except ImportError:
        import pytest as _pytest

        _pytest.skip("Pillow not installed")
    img = Image.new("RGB", (32, 32), (200, 10, 10))
    b = io.BytesIO()
    img.save(b, format="PNG")
    df2 = spark.createDataFrame([(2, b.getvalue())], "media_id long, content binary")
    row2 = MM.resize_images(
        df2, width=4, height=4, resizer=MM.real_resize
    ).collect()[0]
    assert len(row2.pixels) == 16 and all(0 <= p <= 255 for p in row2.pixels)


def test_embedding_multiprobe_superset_no_duplicates(spark, sf_dir):
    """Multi-probe (probe_flips>0) must return a SUPERSET of single-probe
    pairs (extra buckets only add candidates) with no duplicate pairs."""
    from incremental_etl_on_lakehouse_spark.operators import dedup as D
    from incremental_etl_on_lakehouse_spark.tables import load_table

    embs = load_table(spark, "embeddings", sf_dir).limit(200)
    base = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_dup_pairs(
            embs, cosine_threshold=0.5, planes=8
        ).collect()
    }
    probed_rows = D.embedding_dup_pairs(
        embs, cosine_threshold=0.5, planes=8, probe_flips=3
    ).collect()
    probed = [(r["id_a"], r["id_b"]) for r in probed_rows]
    assert len(probed) == len(set(probed))  # no duplicate pairs
    assert base <= set(probed), (len(base), len(probed))


def test_connected_components_raises_without_convergence(spark):
    """A path graph deeper than the iteration budget must raise, never
    silently return fragmented components."""
    from incremental_etl_on_lakehouse_spark.operators import dedup as D

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(chain, max_iterations=2)
    # with budget it converges to a single component
    comps = D.connected_components(chain, max_iterations=10).collect()
    assert {r["component"] for r in comps} == {0}


def test_bloom_bitmap_no_false_negatives_and_low_fp(spark):
    """Every inserted key must probe true (Bloom guarantees zero false
    negatives); disjoint keys may false-positive but at 1 Mbit / 2k keys
    (~0.006 bits-set density) the measured fp count over 10k probes must
    stay far under the exact-verify join's noise floor."""
    m = 1 << 20
    members = spark.range(2000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("k")
    )
    bf = F.broadcast(text.bloom_bitmap(members, "k", m_bits=m))
    hits = (
        members.crossJoin(bf)
        .where(text.bloom_probe("k", m_bits=m))
        .count()
    )
    assert hits == 2000  # no false negatives, ever

    outsiders = spark.range(10000).select(
        F.concat(F.lit("outsider-"), F.col("id")).alias("k")
    )
    fps = (
        outsiders.crossJoin(bf)
        .where(text.bloom_probe("k", m_bits=m))
        .count()
    )
    # (1 - e^{-3*2000/2^20})^3 ~ 1.8e-7 -> expect 0; allow slack for hash
    # clustering without letting a broken probe (fp ~ 10000) pass
    assert fps <= 5, fps


# ---------------------------------------------------------------------------
# built-in PNG codec (round 5: the real no-Pillow decode path)
# ---------------------------------------------------------------------------


def test_png_codec_round_trip():
    import numpy as np

    from incremental_etl_on_lakehouse_spark.operators import png_codec as P

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (11, 5, 3), dtype=np.uint8)
    assert np.array_equal(P.decode_png(P.encode_png(img)), img)


def test_png_codec_unfilters_sub_up_average_paeth():
    """Decode PNGs whose scanlines use every filter type, by applying the
    FORWARD filters here and checking the decoder inverts them."""
    import struct
    import zlib

    import numpy as np

    from incremental_etl_on_lakehouse_spark.operators import png_codec as P

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)
    h, w, _ = img.shape
    ch = 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    scan = b""
    prev = bytes(w * ch)
    for y, ftype in zip(range(h), [0, 1, 2, 3, 4]):
        cur = img[y].tobytes()
        if ftype == 0:
            raw = cur
        elif ftype == 1:
            raw = bytes(
                (cur[x] - (cur[x - ch] if x >= ch else 0)) & 0xFF
                for x in range(len(cur))
            )
        elif ftype == 2:
            raw = bytes((cur[x] - prev[x]) & 0xFF for x in range(len(cur)))
        elif ftype == 3:
            raw = bytes(
                (cur[x] - (((cur[x - ch] if x >= ch else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(len(cur))
            )
        else:
            raw = bytes(
                (
                    cur[x]
                    - paeth(
                        cur[x - ch] if x >= ch else 0,
                        prev[x],
                        prev[x - ch] if x >= ch else 0,
                    )
                )
                & 0xFF
                for x in range(len(cur))
            )
        scan += bytes([ftype]) + raw
        prev = cur

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(png), img)


def test_png_codec_color_types():
    """Gray (0), palette (3), gray+alpha (4), RGBA (6) all decode to RGB."""
    import struct
    import zlib

    import numpy as np

    from incremental_etl_on_lakehouse_spark.operators import png_codec as P

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def png_ct(w, h, ct, rows, plte=None):
        scan = b"".join(b"\x00" + r for r in rows)
        out = b"\x89PNG\r\n\x1a\n" + chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        )
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")

    assert P.decode_png(png_ct(2, 1, 0, [bytes([100, 200])])).tolist() == [
        [[100] * 3, [200] * 3]
    ]
    pal = bytes([255, 0, 0, 0, 255, 0])
    assert P.decode_png(
        png_ct(2, 1, 3, [bytes([1, 0])], plte=pal)
    ).tolist() == [[[0, 255, 0], [255, 0, 0]]]
    assert P.decode_png(png_ct(1, 1, 4, [bytes([77, 255])])).tolist() == [
        [[77] * 3]
    ]
    assert P.decode_png(png_ct(1, 1, 6, [bytes([9, 8, 7, 200])])).tolist() == [
        [[9, 8, 7]]
    ]


def test_png_codec_rejects_garbage():
    import pytest as _pytest

    from incremental_etl_on_lakehouse_spark.operators import png_codec as P

    with _pytest.raises(ValueError, match="signature"):
        P.decode_png(b"GIF89a....")


def test_builtin_image_decoder_contract():
    """Same 8-feature contract as real_image_decoder, exact values."""
    import numpy as np

    from incremental_etl_on_lakehouse_spark.operators import png_codec as P

    img = np.zeros((2, 4, 3), dtype=np.uint8)
    img[:, :] = (50, 100, 150)
    feats = multimodal.builtin_image_decoder(P.encode_png(img))
    assert feats == [4.0, 2.0, 3.0, 50.0, 100.0, 150.0, 150.0, 50.0]


def test_auto_decoder_and_resizer_route_by_magic():
    """PNG bytes take the real built-in path; others the deterministic
    fake — and without Pillow the defaults are the auto variants."""
    import numpy as np

    from incremental_etl_on_lakehouse_spark.operators import png_codec as P

    img = np.full((4, 4, 3), 10, dtype=np.uint8)
    png = P.encode_png(img)
    assert multimodal.auto_image_decoder(png)[:3] == [4.0, 4.0, 3.0]
    junk = b"\xff\xd8notapng" * 10
    assert multimodal.auto_image_decoder(junk) == multimodal.fake_image_decoder(junk)
    assert multimodal.auto_resize(png, 2, 2) == [10, 10, 10, 10]
    assert multimodal.auto_resize(junk, 2, 2) == multimodal.fake_resize(junk, 2, 2)
    if not _pil_available():
        assert multimodal.default_image_decoder() is multimodal.auto_image_decoder
        assert multimodal.default_resizer() is multimodal.auto_resize


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_builtin_codec_matches_pillow():
    """Cross-check: on machines with Pillow, the built-in decode must
    byte-match Pillow's RGB decode of the same PNG."""
    import io

    import numpy as np
    from PIL import Image

    from incremental_etl_on_lakehouse_spark.operators import png_codec as P

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (9, 6, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert np.array_equal(P.decode_png(buf.getvalue()), img)


def test_quality_buckets_by_threshold_edges(spark):
    """Threshold bucketing edge cases: near-equal bucket sizes on distinct
    scores; ALL ties at a boundary fold into the lower bucket; a single
    distinct score puts everything in bucket 1 (threshold semantics — both
    cutoffs equal the one score); n_buckets=1 degenerates to constant 1."""
    from incremental_etl_on_lakehouse_spark.operators.text import (
        quality_buckets_by_threshold,
    )

    # 9 distinct scores -> exact thirds
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(9)], "doc_id long, cross_entropy double"
    )
    out = {
        r["doc_id"]: r["ppl_bucket"]
        for r in quality_buckets_by_threshold(df).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3, 7: 3, 8: 3}

    # massive tie straddling BOTH cuts: the tie folds entirely into bucket
    # 1 and, its cumulative count having reached both cutoffs, t1 = t2 =
    # the tied score — so every higher score lands in the TOP bucket
    # (bucket 2 is empty: threshold semantics, ntile would split the tie)
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(6)] + [(6, 2.0), (7, 3.0), (8, 4.0)],
        "doc_id long, cross_entropy double",
    )
    out = {
        r["doc_id"]: r["ppl_bucket"]
        for r in quality_buckets_by_threshold(df).collect()
    }
    assert all(out[i] == 1 for i in range(6)), out
    assert out[6] == out[7] == out[8] == 3, out

    # one distinct score: t1 = t2 = that score -> everything bucket 1
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(4)], "doc_id long, cross_entropy double"
    )
    assert {
        r["ppl_bucket"]
        for r in quality_buckets_by_threshold(df).collect()
    } == {1}

    # n_buckets=1: constant bucket, no thresholds at all
    assert {
        r["ppl_bucket"]
        for r in quality_buckets_by_threshold(df, n_buckets=1).collect()
    } == {1}

    # n_buckets=4 on 8 distinct scores: exact quarters
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "doc_id long, cross_entropy double"
    )
    out = {
        r["doc_id"]: r["ppl_bucket"]
        for r in quality_buckets_by_threshold(df, n_buckets=4).collect()
    }
    assert out == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4}


def test_wav_codec_roundtrip_and_audio_features(spark):
    """The stdlib WAV codec round-trips 16-bit PCM exactly (mono and
    stereo, both sample rates), rejects non-16-bit widths loudly, and the
    Arrow-batched feature extractor reproduces the exact integer stats."""
    from incremental_etl_on_lakehouse_spark.operators import wav_codec

    samples = [0, 1, -1, 32767, -32768, 123, -456, 789]
    for sr in (8000, 44100):
        buf = wav_codec.encode_wav(samples, sr)
        got_sr, nch, got = wav_codec.decode_wav(buf)
        assert (got_sr, nch, got) == (sr, 1, samples)
    # stereo interleaved
    buf = wav_codec.encode_wav(samples, 16000, n_channels=2)
    got_sr, nch, got = wav_codec.decode_wav(buf)
    assert (got_sr, nch, got) == (16000, 2, samples)
    with pytest.raises(ValueError, match="multiple of n_channels"):
        wav_codec.encode_wav([1, 2, 3], 8000, n_channels=2)
    # 8-bit PCM is rejected, not silently mis-scaled
    import io
    import wave as wv

    b = io.BytesIO()
    with wv.open(b, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(bytes([0, 255, 128]))
    with pytest.raises(ValueError, match="16-bit"):
        wav_codec.decode_wav(b.getvalue())

    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav_codec.encode_wav(samples, 8000)))],
        "media_id long, media_type string, content binary",
    )
    row = multimodal.extract_audio_features(df).collect()[0]
    assert row["sample_rate"] == 8000
    assert row["n_channels"] == 1
    assert row["n_samples"] == len(samples)
    assert row["sum_samples"] == sum(samples)
    assert row["min_sample"] == -32768 and row["max_sample"] == 32767


def test_y4m_codec_roundtrip_and_video_features(spark):
    """The stdlib y4m codec round-trips C444 planes exactly, parses the
    C420 frame-size math, rejects unknown colorspaces/truncation loudly,
    and the Arrow-batched per-frame extractor reproduces exact sums."""
    from incremental_etl_on_lakehouse_spark.operators import y4m_codec

    W, H = 4, 2
    f0 = (bytes(range(8)), bytes([10] * 8), bytes([200] * 8))
    f1 = (bytes([255] * 8), bytes(range(100, 108)), bytes([0] * 8))
    buf = y4m_codec.encode_y4m([f0, f1], W, H, fps=(30, 1))
    w, h, fps, frames = y4m_codec.decode_y4m(buf)
    assert (w, h, fps) == (4, 2, (30, 1))
    assert frames == [f0, f1]
    # C420: u/v planes are quarter-size — hand-build one frame
    hdr = b"YUV4MPEG2 W4 H2 F25:1 C420jpeg\n"
    y = bytes(range(8)); u = bytes([1, 2]); v = bytes([3, 4])
    w, h, _, frames = y4m_codec.decode_y4m(hdr + b"FRAME\n" + y + u + v)
    assert frames == [(y, u, v)]
    with pytest.raises(ValueError, match="colorspace"):
        y4m_codec.decode_y4m(b"YUV4MPEG2 W4 H2 C999\nFRAME\n" + bytes(24))
    with pytest.raises(ValueError, match="truncated"):
        y4m_codec.decode_y4m(buf[:-3])
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        y4m_codec.decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="planes must be"):
        y4m_codec.encode_y4m([(b"xy", b"xy", b"xy")], W, H)

    df = spark.createDataFrame(
        [(7, "video", bytearray(buf))],
        "media_id long, media_type string, content binary",
    )
    rows = {r["frame_index"]: r for r in
            multimodal.extract_video_features(df).collect()}
    assert rows[0]["sum_y"] == sum(range(8))
    assert rows[0]["sum_u"] == 80 and rows[0]["sum_v"] == 1600
    assert rows[1]["sum_y"] == 255 * 8
    assert rows[1]["n_frames"] == 2 and rows[1]["width"] == 4


def test_bpe_train_canonical_merge(spark):
    """BPE merge application is the canonical left-to-right non-
    overlapping scan (Sennrich et al.): in a run of identical symbols,
    merges are left-aligned — 'aaaaa' under pair (a,a) becomes
    [aa, aa, a], never [aa, a, aa] — and chain-adjacent candidates for
    distinct pairs (abab...) all merge."""
    from incremental_etl_on_lakehouse_spark.operators.text import bpe_train

    words = spark.createDataFrame(
        [("aaaaa", 10), ("abab", 1), ("xy", 3)], "w string, freq long"
    )
    merges = bpe_train(words, 3)
    # step 1: (a,a) wins — 4 adjacent pairs x freq 10 = 40
    assert merges[0] == (1, "a", "a", 40)
    # canonical 'aaaaa' -> [aa, aa, a] yields pairs (aa,aa)=10 and
    # (aa,a)=10; the (cnt DESC, l, r) tiebreak picks (aa, a). A
    # NON-canonical [aa, a, aa] split would yield (aa,a) and (a,aa),
    # whose tiebreak winner is (a, aa) — so this assertion pins the
    # left-aligned scan.
    assert merges[1] == (2, "aa", "a", 10)
    # after merging (aa,a): [aa, aaa] -> best pair (aa, aaa) = 10
    assert merges[2] == (3, "aa", "aaa", 10)


def test_bpe_train_distinct_pair_chain(spark):
    """a!=b chains: every candidate merges (no overlap possible)."""
    from incremental_etl_on_lakehouse_spark.operators.text import bpe_train

    words = spark.createDataFrame([("ababab", 5)], "w string, freq long")
    merges = bpe_train(words, 2)
    assert merges[0] == (1, "a", "b", 15)
    # canonical result [ab, ab, ab]: (ab,ab) pairs = 2 x 5
    assert merges[1] == (2, "ab", "ab", 10)


def test_bpe_encode_merges_exhaust_early(spark):
    """When pair counts exhaust before the configured steps, the encode
    keeps the LAST symbol table (Python break) and the oracle chain
    carries it forward (the NOT EXISTS fallback branch) — both sides must
    agree on a degenerate corpus."""
    import duckdb

    from incremental_etl_on_lakehouse_spark.operators.text import bpe_encode
    from incremental_etl_on_lakehouse_spark.queries._s7_extras import (
        _bpe_iter_sql,
    )

    words = spark.createDataFrame([("ab", 3), ("ab", 2)], "w string, freq long") \
        .groupBy("w").agg(__import__("pyspark.sql.functions", fromlist=["sum"]).sum("freq").cast("long").alias("freq"))
    # step 1 merges (a,b) -> every word becomes one symbol; steps 2..4
    # have no pairs left
    got = {
        (r.token, r.n_words, r.total_count)
        for r in bpe_encode(words, 4).collect()
    }
    assert got == {("ab", 1, 5)}

    con = duckdb.connect()
    chain = (
        "WITH w0 AS MATERIALIZED (SELECT wid, freq, CAST(i AS BIGINT) AS pos,"
        " substr(wid, CAST(i AS INT), 1) AS sym FROM"
        " (SELECT wid, freq, unnest(generate_series(1, len(wid))) AS i FROM"
        "  (VALUES ('ab', CAST(5 AS BIGINT))) t(wid, freq))),"
        + ",".join(_bpe_iter_sql(k) for k in range(1, 5))
        + " SELECT sym AS token, CAST(count(DISTINCT wid) AS BIGINT) AS n_words,"
        " CAST(sum(freq) AS BIGINT) AS total_count FROM w4 GROUP BY sym"
    )
    assert set(map(tuple, con.execute(chain).fetchall())) == {("ab", 1, 5)}
