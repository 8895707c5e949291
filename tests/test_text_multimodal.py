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


def test_decode_status_mixed_corpus_counted_never_raises(spark, monkeypatch):
    """Format policy as DATA (magic-byte sniff + per-row decode_status +
    counted metrics) over a mixed PNG / corrupt-PNG / JPEG-stub /
    garbage corpus with fakes DISALLOWED: nothing raises, statuses and
    feature nullability are exact, and decode_metrics counts match."""
    import numpy as np

    from amp import multimodal as mm

    monkeypatch.setenv("AMP_FAKE_DECODE", "0")
    good_png = mm.png_encode(
        np.arange(64, dtype=np.uint8).reshape(8, 8), filter_type=2
    )
    from amp import jpeg as amp_jpeg

    jpeg_img = (np.arange(300, dtype=np.uint16).reshape(15, 20) % 256
                ).astype(np.uint8)
    good_jpeg = amp_jpeg.encode_gray(jpeg_img)
    prog_jpeg = amp_jpeg.encode_gray_progressive(jpeg_img)
    import struct as _struct

    from amp import vp8l as amp_vp8l

    webp_rgba = np.zeros((10, 12, 4), np.uint8)
    webp_rgba[:, :, 1] = np.arange(12, dtype=np.uint8) * 20
    webp_rgba[:, :, 3] = 255
    good_webp = amp_vp8l.encode_lossless(webp_rgba, cache_bits=3)
    lossy_webp = (b"RIFF" + _struct.pack("<I", 16) + b"WEBP"
                  + b"VP8 " + _struct.pack("<I", 4) + b"\x00" * 4)
    rows = [
        ("ok0", good_png),
        ("ok1", mm.png_encode(np.zeros((4, 4), np.uint8))),
        ("corrupt0", good_png[: len(good_png) // 2]),      # torn PNG
        ("jpeg0", b"\xff\xd8\xff\xe0" + b"\x00" * 32),     # torn JPEG
        ("jpeg1", good_jpeg),                              # real baseline JPEG
        ("jpeg2", prog_jpeg),                              # real progressive JPEG
        ("webp0", lossy_webp),                             # lossy VP8: unsupported
        ("webp1", good_webp),                              # real lossless VP8L
        ("junk0", b"not an image at all"),
    ]
    media = spark.createDataFrame(
        [
            {"media_id": k, "kind": "image", "mime": None, "payload": p,
             "width": None, "height": None, "duration_ms": None}
            for k, p in rows
        ],
        schema=mm.MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    if mm.HAVE_PIL:  # ladder differs with Pillow present; core contract same
        assert feats["ok0"]["decode_status"] == "real"
        assert feats["corrupt0"]["decode_status"] == "corrupt"
    else:
        assert feats["ok0"]["decode_status"] == "real" and feats["ok0"]["fmt"] == "png"
        assert feats["ok1"]["decode_status"] == "real"
        assert feats["corrupt0"]["decode_status"] == "corrupt"
        assert feats["corrupt0"]["feature"] is None
        # baseline JPEG now REALLY decodes via amp.jpeg (no Pillow);
        # the torn stub is corrupt-as-data, not a crash
        assert feats["jpeg0"]["decode_status"] == "corrupt"
        assert feats["jpeg0"]["fmt"] == "jpeg"
        assert feats["jpeg1"]["decode_status"] == "real"
        assert feats["jpeg1"]["feature"] is not None
        # progressive JPEG decodes for real too (T.81 Annex G), and
        # the two encodings of the same image yield the same grid
        assert feats["jpeg2"]["decode_status"] == "real"
        assert feats["jpeg2"]["feature"] == feats["jpeg1"]["feature"]
        # lossless WebP decodes for real (amp.vp8l); lossy VP8 is
        # unsupported-as-data
        assert feats["webp0"]["fmt"] == "webp"
        assert feats["webp0"]["decode_status"] == "unsupported"
        assert feats["webp1"]["decode_status"] == "real"
        assert feats["webp1"]["feature"] is not None
        assert feats["junk0"]["decode_status"] == "unsupported"
        assert feats["junk0"]["fmt"] == "unknown"
        m = {
            (r["decode_status"], r["fmt"]): r["n"]
            for r in mm.decode_metrics(mm.extract_features(media)).collect()
        }
        assert m[("real", "png")] == 2 and m[("corrupt", "png")] == 1
        assert m[("real", "jpeg")] == 2 and m[("corrupt", "jpeg")] == 1
        assert m[("unsupported", "webp")] == 1
        assert m[("real", "webp")] == 1
        assert m[("unsupported", "unknown")] == 1

    # with fakes allowed every row gets a feature and a fake/real status
    monkeypatch.setenv("AMP_FAKE_DECODE", "1")
    feats2 = mm.extract_features(media).collect()
    assert all(r["feature"] is not None for r in feats2)
    assert {r["decode_status"] for r in feats2} <= {"real", "fake"}


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


def test_png_roundtrip_all_filters():
    """Pure-stdlib PNG codec: every unfilter branch (None/Sub/Up/
    Average/Paeth) inverts its encoder filter bit-exactly."""
    import numpy as np

    from amp.multimodal import png_decode, png_encode

    rng = np.random.RandomState(7)
    for shape in [(8, 8), (16, 12), (5, 31)]:
        grid = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for ftype in range(5):
            payload = png_encode(grid, filter_type=ftype)
            got = png_decode(payload)
            assert got.shape == shape
            assert np.array_equal((got * 255.0).round().astype(np.uint8), grid), (
                f"filter {ftype} roundtrip mismatch"
            )


def test_png_decode_rgb_luma():
    """Color-type-2 (RGB) branch: hand-assembled PNG decodes to ITU-R
    601 luma."""
    import struct
    import zlib as _zlib

    import numpy as np

    from amp.multimodal import _PNG_SIG, png_decode

    w, h = 3, 2
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[255, 255, 255], [0, 0, 0], [128, 128, 128]]],
        dtype=np.uint8,
    )
    scan = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    got = png_decode(payload) * 255.0
    expect = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert np.allclose(got, expect, atol=1e-4)


def test_extract_features_real_decode_no_fake(spark, monkeypatch):
    """The REAL decode path end-to-end through Spark with the fake
    fallback disabled (AMP_FAKE_DECODE=0): PNG payloads produce exactly
    the row/col means of the decoded 8x8 grid."""
    import numpy as np

    from amp import multimodal as mm

    monkeypatch.setenv("AMP_FAKE_DECODE", "0")
    rng = np.random.RandomState(3)
    grids = {f"p{i}": rng.randint(0, 256, size=(16, 16), dtype=np.uint8) for i in range(4)}
    rows = [
        {
            "media_id": k,
            "kind": "image",
            "mime": "image/png",
            "payload": mm.png_encode(g, filter_type=i % 5),
            "width": 16,
            "height": 16,
            "duration_ms": None,
        }
        for i, (k, g) in enumerate(grids.items())
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: np.array(r["feature"]) for r in mm.extract_features(media).collect()}
    assert len(feats) == 4
    for k, g in grids.items():
        grid = mm._resize8(mm.png_decode(mm.png_encode(g)))
        expect = np.resize(
            np.concatenate([grid.mean(axis=0), grid.mean(axis=1)]), 16
        ).astype(np.float32)
        assert np.allclose(feats[k], expect, atol=1e-6)
        # and it is NOT the content-hash fake of the same payload
        import hashlib as _hashlib

        digest = _hashlib.sha256(mm.png_encode(g, filter_type=0)).digest()
        fake = (
            np.frombuffer((digest * 2)[:64], dtype=np.uint8)
            .reshape(8, 8)
            .astype(np.float32)
            / 255.0
        )
        assert not np.allclose(feats[k][:8], fake.mean(axis=0), atol=1e-6)


def test_decode_corrupt_png_raises_without_fake():
    from amp import multimodal as mm

    bad = mm._PNG_SIG + b"\x00" * 20
    if mm.HAVE_PIL:
        import pytest as _pytest

        with _pytest.raises(Exception):
            mm._decode_image(bad, allow_fake=False)
    else:
        import pytest as _pytest

        with _pytest.raises(Exception):
            mm._decode_image(bad, allow_fake=False)
    # with the fake allowed, a corrupt payload degrades deterministically
    g1 = mm._decode_image(bad, allow_fake=True)
    g2 = mm._decode_image(bad, allow_fake=True)
    assert g1.shape == (8, 8) and (g1 == g2).all()


def test_frame_sample_real_gif_decode(spark, monkeypatch):
    """frame_sample(decode=True): animated GIFs REALLY decode — each
    sampled timestamp maps to its frame via the cumulative delays —
    while undecodable containers stay status-as-data."""
    import struct as _struct

    import numpy as np

    from amp import multimodal as mm

    monkeypatch.setenv("AMP_FAKE_DECODE", "0")
    # two frames, 200 ms each, visually distinct
    pal = b"".join(bytes((v, v, v)) for v in range(256))
    f0 = np.full((4, 4), 40, np.uint8)
    f1 = np.full((4, 4), 220, np.uint8)

    def lzw_trivial(data: bytes) -> bytes:
        # clear-per-pixel appendix-F floor encoder, 8-bit codes
        acc, nbits, out = 0, 0, bytearray()
        for code in [256] + [c for b in data for c in (b, 256)] + [257]:
            acc |= code << nbits
            nbits += 9
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    body = bytearray(b"GIF89a" + _struct.pack("<HH", 4, 4)
                     + bytes((0xF7, 0, 0)) + pal)
    for img in (f0, f1):
        raw = lzw_trivial(img.tobytes())
        body += bytes((0x21, 0xF9, 4, 0x04, 20, 0, 0, 0))  # 200 ms, keep
        body += b"\x2c" + _struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00"
        body += bytes((8,))
        for i in range(0, len(raw), 255):
            part = raw[i:i + 255]
            body += bytes((len(part),)) + part
        body += b"\x00"
    body += b"\x3b"
    gif = bytes(body)

    media = spark.createDataFrame(
        [
            {"media_id": "anim0", "kind": "video", "mime": "image/gif",
             "payload": gif, "width": 4, "height": 4, "duration_ms": 400},
            {"media_id": "vid0", "kind": "video", "mime": "video/mp4",
             "payload": b"\x00\x00\x00\x18ftypmp42", "width": None,
             "height": None, "duration_ms": 300},
        ],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {(r["media_id"], r["frame_ts_ms"]): r
            for r in mm.frame_sample(media, every_ms=150,
                                     decode=True).collect()}
    # anim0 sampled at 0/150/300: frames 0, 0, 1 by cumulative delays
    assert rows[("anim0", 0)]["frame_index"] == 0
    assert rows[("anim0", 150)]["frame_index"] == 0
    assert rows[("anim0", 300)]["frame_index"] == 1
    for ts, want in ((0, 40 / 255.0), (300, 220 / 255.0)):
        r = rows[("anim0", ts)]
        assert r["decode_status"] == "real" and r["fmt"] == "gif"
        assert abs(r["feature"][0] - want) < 1e-3
    # the mp4 container has no pure-stdlib decoder: status stays data
    for ts in (0, 150):
        r = rows[("vid0", ts)]
        assert r["decode_status"] == "unsupported"
        assert r["feature"] is None and r["frame_index"] is None

    # fakes allowed: every sampled frame gets a deterministic feature
    monkeypatch.setenv("AMP_FAKE_DECODE", "1")
    rows2 = mm.frame_sample(media, every_ms=150, decode=True).collect()
    assert all(r["feature"] is not None for r in rows2)
    assert {r["decode_status"] for r in rows2} <= {"real", "fake"}


def test_decompress_documents_statuses(spark):
    """Compressed-corpus ingestion: gzip/bz2/xz/zlib payloads
    decompress for real, plain text passes through, zstd is
    unsupported-as-data, bombs hit the byte ceiling as 'oversize'
    without materializing, torn streams and non-utf8 are corrupt."""
    import bz2 as _bz2
    import gzip as _gzip
    import lzma as _lzma
    import zlib as _zlib

    from amp.text import decompress_documents

    body = "the quick corpus document " * 40
    bomb = b"\x00" * (4 << 20)  # 4 MiB of zeros compresses tiny
    rows = [
        (1, _gzip.compress(body.encode())),
        (2, _bz2.compress(body.encode())),
        (3, _lzma.compress(body.encode())),
        (4, _zlib.compress(body.encode())),
        (5, body.encode()),                          # plain passthrough
        (6, b"\x28\xb5\x2f\xfd" + b"\x00" * 20),     # zstd: unsupported
        (7, _gzip.compress(body.encode())[:-6]),     # torn gzip
        (8, _gzip.compress(bomb)),                   # bomb vs ceiling
        (9, _gzip.compress(b"\xff\xfe garbage \xff")),  # non-utf8
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decompress_documents(
        docs, max_text_bytes=1 << 20).collect()}
    for did, codec in ((1, "gzip"), (2, "bz2"), (3, "xz"), (4, "zlib"),
                       (5, "none")):
        r = out[did]
        assert (r["decode_status"], r["codec"]) == ("real", codec), did
        assert r["text"] == body
        assert r["n_text_bytes"] == len(body.encode())
    assert out[6]["decode_status"] == "unsupported"
    assert out[6]["codec"] == "zstd" and out[6]["text"] is None
    assert out[7]["decode_status"] == "corrupt"
    assert out[8]["decode_status"] == "oversize"
    assert out[8]["text"] is None
    assert out[9]["decode_status"] == "corrupt"

    # decompressed rows feed the text operators directly
    from amp import text as amp_text

    real = decompress_documents(docs, max_text_bytes=1 << 20).where(
        "decode_status = 'real'")
    counts = {r["doc_id"]: r["word_tokens"]
              for r in amp_text.token_counts(real).collect()}
    assert counts[1] == counts[5] == len(body.split())


def test_repetition_metrics_crafted_and_duckdb_parity(spark):
    """Gopher-rule repetition signals on crafted edge cases, with the
    Spark column math cross-checked bit-exact against the DuckDB oracle
    expression on the SAME rows (the driver only checks the corpus;
    this covers empty docs, dup lines, periodic 5-grams)."""
    import duckdb
    import pandas as pd

    rows = [
        (0, "aaa bbb\naaa bbb\nccc"),          # dup line, repeated 2-gram
        (1, "hi"),                               # too short for any gram
        (2, "a b c d e " * 3),                   # periodic: dup 5-grams
        (3, ""),                                  # empty
        (4, "x y\n\n  \nx  y"),                  # blank lines dropped, trim
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.repetition_metrics(docs).collect()}

    assert got[0]["n_lines"] == 3
    assert got[0]["dup_line_frac"] == pytest.approx(1 / 3, abs=2e-6)
    # g2 = [aaa bbb, bbb aaa, aaa bbb, bbb ccc] -> top 2/4
    assert got[0]["top_2gram_frac"] == pytest.approx(0.5, abs=2e-6)
    assert got[1]["n_lines"] == 1
    assert got[1]["top_2gram_frac"] == 0.0 and got[1]["dup_5gram_frac"] == 0.0
    # 15 tokens, 11 5-grams, 5 distinct -> 6/11 duplicated
    assert got[2]["dup_5gram_frac"] == pytest.approx(6 / 11, abs=2e-6)
    assert got[3]["n_lines"] == 0 and got[3]["dup_line_frac"] == 0.0
    assert got[4]["n_lines"] == 2  # blank/whitespace lines dropped
    # "x y" vs "x  y" trim to different strings? no: inner spaces stay
    assert got[4]["dup_line_frac"] == 0.0

    # DuckDB twin on the same rows (oracle body minus the corpus prep)
    con = duckdb.connect()
    con.register("prep", pd.DataFrame(rows, columns=["doc_id", "text"]))
    import __spark_entry__ as entry

    sql = entry.oracle_sql()["text_repetition"]
    sql = sql.replace(
        "prep AS (\n  SELECT doc_id, replace(text, ' table ', chr(10)) AS text FROM documents\n),\n",
        "",
    )
    assert "documents" not in sql
    oracle = {
        int(r[0]): r for r in con.sql(sql).fetchall()
    }
    for did, r in got.items():
        o = oracle[did]
        assert (r["n_lines"], r["dup_line_frac"], r["top_2gram_frac"],
                r["dup_5gram_frac"]) == (o[1], o[2], o[3], o[4]), did


def test_pii_scan_counts_and_redaction(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.org and d@e.io, ip 10.0.0.255, "
            "call +44 20-7946 0958 now"),
        (2, "no pii here, just 1234567890 digits and a.b notation"),
        (3, "edge 999.999.999.999 still counted by the naive ipv4 shape"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.pii_scan(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4s"], out[1]["n_phones"]) == (2, 1, 1)
    assert out[1]["pii_total"] == 4
    assert "<EMAIL>" in out[1]["redacted"] and "<IP>" in out[1]["redacted"]
    assert "<PHONE>" in out[1]["redacted"]
    assert "@" not in out[1]["redacted"]
    # bare digit runs are NOT international phones (no leading +)
    assert (out[2]["n_emails"], out[2]["n_ipv4s"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[2]["redacted"] == rows[1][1]
    assert out[3]["n_ipv4s"] == 1


def test_compress_documents_roundtrip_unicode_and_determinism(spark):
    from amp.text import compress_documents, decompress_documents

    body = "héllo wörld ✓ " * 30  # multi-byte utf-8: bytes != chars
    rows = [(i, body, c) for i, c in enumerate(
        ["gzip", "bz2", "xz", "zlib", "none"])]
    docs = spark.createDataFrame(rows, "doc_id long, text string, codec string")

    comp1 = {r["doc_id"]: r for r in compress_documents(
        docs, codec_col="codec").collect()}
    comp2 = {r["doc_id"]: r for r in compress_documents(
        docs, codec_col="codec").collect()}
    for did in comp1:
        assert bytes(comp1[did]["payload"]) == bytes(comp2[did]["payload"]), (
            "compression must be deterministic (retries/re-runs byte-equal)")
        assert comp1[did]["n_raw_bytes"] == len(body.encode("utf-8"))
        assert comp1[did]["n_payload_bytes"] == len(bytes(comp1[did]["payload"]))

    out = {r["doc_id"]: r for r in decompress_documents(
        compress_documents(docs, codec_col="codec")).collect()}
    for did, (_, _, codec) in zip(sorted(out), rows):
        r = out[did]
        assert (r["decode_status"], r["codec"]) == ("real", codec)
        assert r["text"] == body
        assert r["n_text_bytes"] == len(body.encode("utf-8"))

    # fixed-codec mode (no codec column)
    one = compress_documents(docs.select("doc_id", "text"), codec="gzip")
    assert {r["codec"] for r in one.collect()} == {"gzip"}


def test_decompress_multi_member_streams(spark):
    """Real web corpora concatenate compression members (multi-member
    gzip WET files, pbzip2 multi-stream archives). Returning only the
    first member would be silent data loss — all members must decode,
    the ceiling must span the WHOLE concatenation, and a torn SECOND
    member is corrupt, not half-real."""
    import bz2 as _bz2
    import gzip as _gzip
    import lzma as _lzma

    from amp.text import decompress_documents

    a, b, c = "first doc body. ", "second doc body. ", "third."
    gz = b"".join(_gzip.compress(s.encode(), mtime=0) for s in (a, b, c))
    bz = _bz2.compress(a.encode()) + _bz2.compress(b.encode())
    xz = _lzma.compress(a.encode()) + _lzma.compress(b.encode())
    rows = [
        (1, gz),
        (2, bz),
        (3, xz),
        (4, gz + b"\x00" * 8),                       # NUL block padding ok
        (5, _gzip.compress(a.encode(), mtime=0)
            + _gzip.compress(b.encode(), mtime=0)[:-5]),   # torn 2nd member
        (6, _bz2.compress(b"\x00" * (4 << 20))
            + _bz2.compress(b"\x00" * (4 << 20))),   # bomb spans members
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decompress_documents(
        docs, max_text_bytes=1 << 20).collect()}
    assert out[1]["text"] == a + b + c and out[1]["decode_status"] == "real"
    assert out[2]["text"] == a + b
    assert out[3]["text"] == a + b
    assert out[4]["text"] == a + b + c
    assert out[5]["decode_status"] == "corrupt"
    assert out[6]["decode_status"] == "oversize" and out[6]["text"] is None
