"""Stage 1 — normalize: ingest the repo-files table, derive ids + features.

Reference parity (SURVEY.md §2.2/§2.8): the reference lowercases and
standardizes every text field at ingest (shared.go:191-203,
standardizer.go:40-72) and derives n-gram token streams
(make_tf_idf.go:53-63). Here the record is a source file, so the analog
is: strip comments, fold whitespace/punctuation, lowercase, tokenize.

Everything in this stage is built-in Catalyst expressions — one
narrow-only projection over the scan (no shuffle, no Python). The
whole stage lives inside a single WholeStageCodegen span.

Per-row invariant (BASELINE.json input_hint): ``content_sha =
sha2(content, 256)`` is computed here and carried through every
downstream table; tests re-verify it never changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import AmpConfig, DEFAULT_CONFIG

# Unit separator — cannot appear in repo/path/commit, so the concat is injective.
_US = ""

# comment syntax across the langs we ingest ({py, go, js, java, c, md, ...})
_BLOCK_COMMENT_RE = r"(?s)/\*.*?\*/"
_LINE_COMMENT_RE = r"(//|#|--)[^\n]*"
_NON_TOKEN_RE = r"[^a-z0-9_]+"


def record_id_expr(repo: str = "repo", path: str = "path", commit: str = "commit"):
    """Deterministic record id — replaces the reference's SERIAL pk
    (scripts/init_db.sql:55). ``monotonically_increasing_id`` is
    nondeterministic across retries, so ids are content-addressed."""
    return F.sha2(F.concat_ws(_US, F.col(repo), F.col(path), F.col(commit)), 256)


def normalize(files: DataFrame, cfg: AmpConfig = DEFAULT_CONFIG, run_id: int = 0) -> DataFrame:
    """repo_files(repo, path, commit, lang, content) -> records.

    Output: record_id, content_sha, repo, path, commit, lang,
    basename, stem, norm_text, tokens (array<string>, capped),
    n_tokens, n_chars, size_bucket, run_id.
    """
    norm_text = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("content")), _BLOCK_COMMENT_RE, " "),
                _LINE_COMMENT_RE,
                " ",
            ),
            _NON_TOKEN_RE,
            " ",
        )
    )

    basename = F.element_at(F.split(F.col("path"), "/"), -1)

    out = (
        files.withColumn("record_id", record_id_expr())
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
        .withColumn("n_chars", F.length(F.col("content")))
        .withColumn("norm_text", norm_text)
        .withColumn(
            "tokens",
            F.slice(
                F.filter(F.split(F.col("norm_text"), " "), lambda x: x != ""),
                1,
                cfg.max_tokens,
            ),
        )
        .withColumn("n_tokens", F.size(F.col("tokens")))
        .withColumn("basename", basename)
        .withColumn("stem", F.regexp_replace(basename, r"\.[a-z0-9]+$", ""))
        .withColumn(
            "size_bucket", F.floor(F.log2(F.col("n_chars").cast("double") + F.lit(1.0)))
        )
        .withColumn("run_id", F.lit(run_id))
        .select(
            "record_id",
            "content_sha",
            "repo",
            "path",
            "commit",
            "lang",
            "basename",
            "stem",
            "norm_text",
            "tokens",
            "n_tokens",
            "n_chars",
            "size_bucket",
            "run_id",
        )
    )
    return out


def shingles_expr(k: int, tokens_col: str = "tokens"):
    """k-token shingle hashes as array<int> — JVM-side (murmur3 via
    ``hash``), no Python. Empty-ish docs get a single whole-string shingle
    (reference parity: ngrams() returns the whole string when shorter
    than n, ngram_similarity.go:41-43)."""
    return F.expr(
        f"""
        CASE WHEN size({tokens_col}) < {k}
             THEN array(hash(concat_ws(' ', {tokens_col})))
             ELSE transform(
                    sequence(1, size({tokens_col}) - {k} + 1),
                    i -> hash(concat_ws(' ', slice({tokens_col}, i, {k}))))
        END
        """
    )


def representatives(records: DataFrame) -> DataFrame:
    """One canonical row per distinct content (min record_id wins).

    Code corpora are dominated by exact duplicates (vendored files,
    license boilerplate). Pair-scoring must only ever see one
    representative per distinct content — an m-way exact-dup group
    otherwise explodes into m^2/2 identical near-dup pairs. This is
    also the skew story: the hottest blocking keys are exact-dup
    contents, and they are removed *before* blocking. The reference
    has no analog (its demo data is small); at 10^12 files this is
    the single biggest pair-count lever.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("content_sha").orderBy("record_id")
    return (
        records.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_edges(records: DataFrame) -> DataFrame:
    """Star edges inside each exact-duplicate group: (member -> min id).

    m identical files contribute m-1 edges, not m^2/2 pairs — the
    connected-components stage absorbs them transitively. Replaces the
    reference's self-match-everything `/duplicates` semantics
    (pkg/api/handler.go:82-102) with a linear-cost equivalent.
    """
    grp = records.groupBy("content_sha").agg(F.min("record_id").alias("canon_id"))
    return (
        records.select("record_id", "content_sha")
        .join(grp, "content_sha")
        .where(F.col("record_id") != F.col("canon_id"))
        .select(
            F.col("canon_id").alias("left_id"),
            F.col("record_id").alias("right_id"),
            F.lit("exact_sha").alias("pass_name"),
        )
    )
