"""Text analysis + multimodal plumbing."""

from __future__ import annotations

import pytest

from neo4j_dynagraph_spark.operators import multimodal, text

DOCS = [
    (0, "the cat and the dog and the bird", "s0"),
    (1, "el perro y el gato y la casa de que", "s0"),
    (2, "zzz qqq www", "s0"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_text_stats(docs):
    out = {r.doc_id: r for r in text.text_stats(docs).collect()}
    assert out[0].n_tokens == 8
    assert out[0].n_distinct == 5  # the, cat, and, dog, bird
    assert abs(out[0].stop_ratio - 3 / 8) < 1e-9  # three 'the'
    assert out[2].ttr == 1.0


def test_lang_id(docs):
    out = {r.doc_id: r.pred_lang for r in text.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "unk"


def test_token_frequencies(docs):
    out = {r.token: r.cnt for r in text.token_frequencies(docs).collect()}
    assert out["the"] == 3 and out["el"] == 2 and out["zzz"] == 1


def test_fingerprint_deterministic(docs):
    a = {r.doc_id: r.fingerprint for r in text.doc_fingerprints(docs).collect()}
    b = {r.doc_id: r.fingerprint for r in text.doc_fingerprints(docs).collect()}
    assert a == b and len(a) == 3


def test_multimodal_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"\x00\x01", "image", fake=False)


def test_multimodal_pipeline(docs):
    media = multimodal.docs_as_media(docs)
    rows = media.collect()
    assert all(r.payload_len == len(r.payload) for r in rows)
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 3
    assert all(len(r.feature) == 8 for r in feats)
    # deterministic: same payload -> same feature
    again = multimodal.extract_features(media, fake=True).collect()
    assert {r.media_id: r.feature for r in feats} == {
        r.media_id: r.feature for r in again
    }


def test_resize_fixed_output_size(docs):
    media = multimodal.docs_as_media(docs, kind="image")
    out = multimodal.resize_images(media, width=8, height=4).collect()
    assert len(out) == 3
    for r in out:
        assert r.payload_len == 32 == len(r.payload)
    # metadata recomputed from the NEW bytes, not carried over
    import hashlib

    for r in out:
        assert r.payload_md5 == hashlib.md5(bytes(r.payload)).hexdigest()


def test_sample_frames_one_to_many(docs):
    media = multimodal.docs_as_media(docs, kind="video")
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    out = multimodal.sample_frames(media, frame_bytes=4, every_nth=2).collect()
    assert len(out) > len(src), "frame sampling must expand rows"
    for r in out:
        assert r.frame_idx % 2 == 0
        assert len(r.payload) == 4 == r.payload_len
        start = r.frame_idx * 4
        assert bytes(r.payload) == src[r.media_id][start : start + 4]


def test_search_all_terms_and_semantics(spark):
    from neo4j_dynagraph_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (0, "spark merge vector spark", "s"),   # all three, spark twice
            (1, "spark merge", "s"),                # missing vector
            (2, "vector vector merge spark", "s"),  # all three
            (3, "unrelated words only", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r.hits
           for r in text_ops.search_all_terms(docs, ["spark", "merge", "vector"]).collect()}
    assert out == {0: 4, 2: 4}  # AND semantics; hits = total occurrences
