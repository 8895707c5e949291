"""Parity with the reference's scalar semantics.

Golden cases ported from /root/reference/tests/standardizer_test.go:9-103
and the README worked example's trigram_cosine_* vectors (the only
fields of the example reproducible from the reference's current code —
see amp.reference_parity module docstring).
"""

from __future__ import annotations

import math

import pytest

from amp.reference_parity import (
    calculate_binary_key,
    composite_score,
    is_numeric,
    ngram_frequency_similarity,
    standardize_address,
)

# tests/standardizer_test.go:10-66 — golden table, verbatim
STANDARDIZER_CASES = [
    ("123 Main Street", "123 main st"),
    ("456 North Elm Avenue", "456 n elm ave"),
    ("789 Oak Drive Apt #301", "789 oak dr apt 301"),
    ("1010   Maple    Lane", "1010 maple ln"),
    ("2020 SuNsEt BoUlEvArD", "2020 sunset blvd"),
    ("PO Box 12345", "po box 12345"),
    ("3030 Business Center Drive, Suite 200", "3030 business ctr dr ste 200"),
    ("4040 Southwest Highland TERRACE, Unit #B-12, Floor 3", "4040 sw highland ter unit b12 fl 3"),
    ("5050 eastern parkway circle", "5050 eastern pkwy cir"),
    ("6060 WESTERN HEIGHTS COURT NORTHWEST", "6060 western heights ct nw"),
]


@pytest.mark.parametrize("raw,expected", STANDARDIZER_CASES)
def test_standardize_address(raw, expected):
    assert standardize_address(raw) == expected


# tests/standardizer_test.go:81-103 — verbatim
@pytest.mark.parametrize(
    "s,expected",
    [
        ("12345", True),
        ("123abc", False),
        ("", True),
        ("123-456", False),
        ("123.45", False),
        ("9876543210", True),
    ],
)
def test_is_numeric(s, expected):
    assert is_numeric(s) == expected


def test_bigram_cosine_readme_vectors():
    """Exact floats from the reference README worked example."""
    assert ngram_frequency_similarity(
        "7922 iron oak gardens", "547 cinder oak glade", 2
    ) == pytest.approx(0.3429971702850177, abs=1e-15)
    assert ngram_frequency_similarity("caguas", "caguas", 2) == pytest.approx(
        0.9999999999999998, abs=1e-15
    )
    assert ngram_frequency_similarity("mary", "roger", 2) == 0.0
    # empty input -> 0.0 (ngram_similarity.go:97-100)
    assert ngram_frequency_similarity("", "", 2) == 0.0
    assert ngram_frequency_similarity("a", "", 2) == 0.0


def test_ngram_whole_string_when_short():
    # ngrams() returns the whole normalized string when len < n
    # (ngram_similarity.go:41-43): "ab" vs "ab" with n=3 -> identical
    assert ngram_frequency_similarity("ab", "ab", 3) == 1.0


def test_composite_score_formula():
    # perfect self-match saturates the clamp (README candidate 1: score 100)
    assert composite_score(0.0, 9.503990391442475, 1, 1, 1, 1, 1, 1, True) == 100.0
    # all-zero features floor at 1 (matcher.go:208)
    assert composite_score(1.0, 0.0, 0, 0, 0, 0, 0, 0, False) == 1.0
    # hand-computed mid case
    s = composite_score(0.1, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, True)
    expected = (0.9 * 0.25 + 0.5 * 0.2 + 0.5 * 0.4 + 0.5 * 0.1 + 1.0 * 0.05) * 100
    assert s == pytest.approx(expected)


def test_binary_key_shape():
    key = calculate_binary_key("9533 little forest")
    assert len(key) == 10 and set(key) <= {"0", "1"}
    # anchor 1 matches itself -> bit 0 set
    assert key[0] == "1"
    assert calculate_binary_key("") == "0000000000"
