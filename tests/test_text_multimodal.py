"""Text-analysis operators on tiny fixtures + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amp import text
from amp.multimodal import extract_features, frame_sample, synth_media


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The cat and the dog. To be, or not!", "en", "s", 36),
            (2, "der hund und die katze ist nicht da", "de", "s", 35),
            (3, "12345 67890 --- ###", "xx", "s", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_token_counts(spark, docs):
    rows = {r["doc_id"]: r for r in text.token_counts(docs).collect()}
    assert rows[1]["word_tokens"] == 9
    assert rows[3]["word_tokens"] == 2
    assert rows[3]["bpe_ish_tokens"] == 2 + 6  # two number runs + 6 symbols


def test_lang_id(spark, docs):
    rows = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "und"


def test_quality_orders_sanely(spark, docs):
    rows = {r["doc_id"]: r["quality"] for r in text.quality_score(docs).collect()}
    # prose beats digit soup
    assert rows[1] > rows[3]


def test_fingerprints_normalization_invariance(spark):
    d = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "goodbye world")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.fingerprints(d).collect()}
    assert rows[1]["exact_fp"] == rows[2]["exact_fp"]
    assert rows[1]["exact_fp"] != rows[3]["exact_fp"]


def test_multimodal_feature_shapes(spark):
    media = synth_media(spark, 12)
    feats = extract_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["payload_sha"]) == 64
        assert len(r["feature"]) == 16
    # deterministic across runs
    again = extract_features(synth_media(spark, 12)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_frame_sample_row_counts(spark):
    media = synth_media(spark, 12)
    fs = frame_sample(media, every_ms=1000)
    rows = fs.groupBy("media_id").count().collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.where(F.col("kind") == "video").collect()}
    for r in rows:
        dur = vids[r["media_id"]]
        assert r["count"] == (dur - 1) // 1000 + 1


def test_decode_real_path_when_pil_else_fake(spark):
    """Real decode runs when Pillow is importable (grayscale 8x8 via
    PIL), deterministic fake otherwise — same plumbing either way."""
    import numpy as np

    from amp import multimodal as mm

    if mm.HAVE_PIL:
        import io as _io

        from PIL import Image

        buf = _io.BytesIO()
        Image.new("L", (32, 32), color=200).save(buf, format="PNG")
        grid = mm._decode_image(buf.getvalue(), allow_fake=False)
        assert grid.shape == (8, 8)
        assert np.allclose(grid, 200.0 / 255.0, atol=1e-6)
    else:
        with pytest.raises(NotImplementedError):
            mm._decode_image(b"not-an-image", allow_fake=False)
        g1 = mm._decode_image(b"payload")
        g2 = mm._decode_image(b"payload")
        assert g1.shape == (8, 8) and (g1 == g2).all()
