"""Text analysis operators for large-scale training-data pipelines.

All four operators (language-ID, quality scoring, token counting,
fingerprinting) are pure built-in-function column pipelines — they scan
once, stay inside whole-stage codegen, and are embarrassingly parallel,
so they hold at any scale (no shuffle except explicit aggregations).

Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish word/number/punct segmentation (public GPT-2-style shape):
# runs of letters, runs of digits, or single non-space symbols
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# tiny per-language marker vocabularies for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "que", "de", "es"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens_col(text_col: str = "text"):
    """Whitespace/punct tokenization shared by every operator —
    identical semantics to the DuckDB oracle's
    list_filter(string_split_regex(lower(t), re), x -> x <> '')."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda x: x != ""
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex segments."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("ws_tokens"),
        F.size(tokens_col()).alias("word_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_RE)).alias("bpe_ish_tokens"),
        F.length("text").alias("n_chars"),
    )


def _marker_hits(toks_ref: str, words: list[str]):
    """Marker-word hit count from an already-materialized token array —
    one array membership scan per marker instead of a full regex pass
    over the document text. At 100 TB the difference is ~25 regex
    compilations x full-text scans per row vs one tokenize + cheap
    in-memory array filters."""
    return sum(
        (
            F.size(F.filter(F.col(toks_ref), lambda x: x == F.lit(w))).cast("double")
            for w in words
        ),
        F.lit(0.0),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality scoring: length/punctuation/stopword/digit ratios folded
    into one [0,1] score. Tokenizes ONCE (materialized `toks` column);
    stopword hits count token equality, not per-marker regex scans.
    The exact weights are a heuristic; what matters for the engine is
    the shape: single-scan column math."""
    d = docs.withColumn("toks", tokens_col())
    n_chars = F.length("text").cast("double")
    n_tokens = F.size("toks").cast("double")
    punct_ratio = F.regexp_count(F.col("text"), F.lit("[^a-zA-Z0-9\\s]")).cast(
        "double"
    ) / F.greatest(n_chars, F.lit(1.0))
    digit_ratio = F.regexp_count(F.col("text"), F.lit("[0-9]")).cast(
        "double"
    ) / F.greatest(n_chars, F.lit(1.0))
    stop_hits = _marker_hits("toks", LANG_MARKERS["en"])
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1.0))
    mean_tok_len = n_chars / F.greatest(n_tokens, F.lit(1.0))
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.35
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.25
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.2
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(4.0), F.lit(1.0))) * 0.1
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), 0.1).otherwise(0.0)
    )
    # +1e-9 before rounding: the weight lattice (multiples of 0.05) lands
    # quality exactly on .xxxxx5 boundaries, where Spark (decimal-string
    # HALF_UP) and DuckDB (binary-double) round differently
    eps = F.lit(1e-9)
    return d.select(
        "doc_id",
        F.round(punct_ratio + eps, 6).alias("punct_ratio"),
        F.round(stop_ratio + eps, 6).alias("stop_ratio"),
        F.round(score + eps, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Language-ID heuristic: count per-language marker-word hits in the
    once-materialized token array and take the argmax (ties -> first
    language code in order). A real-corpus version swaps markers for
    char-n-gram profiles; the operator shape (tokenize once + column
    math, no shuffle) is identical."""
    d = docs.withColumn("toks", tokens_col())
    hit_cols = {
        lang: _marker_hits("toks", words) for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hit_cols.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break: first max in order
        pred = pred.when(hit_cols[lang] == best, F.lit(lang))
    return d.select(
        "doc_id",
        "lang",
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in sorted(LANG_MARKERS)],
        pred.otherwise(F.lit("und")).alias("pred_lang"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprinting:
    exact_fp   — sha256 of the token-normalized text (whitespace/punct-
                 insensitive exact dedup key);
    minhash_fp — lexicographic-min md5 over distinct tokens (1-perm
                 MinHash; near-dup key). Both engine and oracle use md5
                 so the comparison is bit-exact."""
    norm = F.concat_ws(" ", tokens_col())
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.sha2(norm, 256).alias("exact_fp"),
        F.array_min(F.transform(toks, lambda t: F.md5(t))).alias("minhash_fp"),
    )


# ---------------------------------------------------------------------------
# compressed-document ingestion (web corpora ship gzip/bz2/xz payloads)
# ---------------------------------------------------------------------------

DECOMPRESS_SCHEMA = (
    "doc_id long, text string, codec string, decode_status string, "
    "n_raw_bytes long, n_text_bytes long"
)


def _sniff_codec(raw: bytes) -> str:
    if raw[:2] == b"\x1f\x8b":
        return "gzip"
    if raw[:3] == b"BZh":
        return "bz2"
    if raw[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if raw[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd"  # recognized but not decodable with the stdlib
    if len(raw) >= 2 and raw[0] == 0x78 and (raw[0] * 256 + raw[1]) % 31 == 0:
        return "zlib"
    return "none"


def _bounded_decompress(raw: bytes, codec: str, max_bytes: int) -> bytes:
    """Decompress with an output-size ceiling — a 100-TB pass must not
    let one decompression bomb take down an executor. All three stdlib
    decompressors support incremental max_length draining."""
    import bz2
    import lzma
    import zlib as _zlib

    if codec == "gzip":
        d = _zlib.decompressobj(wbits=31)
    elif codec == "zlib":
        d = _zlib.decompressobj()
    elif codec == "bz2":
        d = bz2.BZ2Decompressor()
    else:
        d = lzma.LZMADecompressor()
    out = d.decompress(raw, max_bytes + 1)
    if len(out) > max_bytes or (
        not d.eof and getattr(d, "unconsumed_tail", b"")
    ) or (not d.eof and codec in ("bz2", "xz")):
        # more output was available past the cap, or input remains
        raise OverflowError("decompressed output exceeds the ceiling")
    if not d.eof:
        # zlib-family: input fully fed but the stream never finished
        raise ValueError("truncated stream")
    return out


def decompress_documents(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_text_bytes: int = 16 * 1024 * 1024,
    encoding: str = "utf-8",
) -> DataFrame:
    """Binary corpus payloads -> text rows, outcome AS DATA (the
    multimodal ladder's contract applied to text ingestion):

      real        — payload decompressed (gzip/zlib/bz2/xz, sniffed by
                    magic bytes) or was already plain text; ``text``
                    holds the decoded string
      oversize    — decompressed output exceeded ``max_text_bytes``
                    (bomb guard: the stdlib decompressors drain with a
                    max_length ceiling, so the executor never
                    materializes the bomb); text NULL
      corrupt     — claimed a known codec but failed to decompress, or
                    the bytes do not decode as ``encoding``; text NULL
      unsupported — recognized container without a stdlib decoder
                    (zstd); text NULL

    One Arrow-batched mapInPandas pass, no shuffle; payloads never
    leave the executor that read them."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            ids, texts, codecs, statuses, nraw, ntext = [], [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                codec = _sniff_codec(raw)
                text = None
                status = "real"
                n_out = 0
                try:
                    if codec == "zstd":
                        status = "unsupported"
                    else:
                        data = raw if codec == "none" else \
                            _bounded_decompress(raw, codec, max_text_bytes)
                        if len(data) > max_text_bytes:
                            status = "oversize"
                        else:
                            text = data.decode(encoding)
                            n_out = len(data)
                except OverflowError:
                    status = "oversize"
                except Exception:
                    status = "corrupt"
                ids.append(int(did))
                texts.append(text)
                codecs.append(codec)
                statuses.append(status)
                nraw.append(len(raw))
                ntext.append(n_out)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "codec": codecs,
                    "decode_status": statuses,
                    "n_raw_bytes": nraw,
                    "n_text_bytes": ntext,
                }
            )

    return docs.select(id_col, payload_col).mapInPandas(
        fn, DECOMPRESS_SCHEMA
    )
