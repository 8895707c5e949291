"""Reference-shaped address pipeline: the match.sql semantics on
customer-style records (FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

RECORDS = [
    # customer_id, first, last, phone, street, city, state, zip
    (1, "mary", "baldwin", "", "7922 Iron Oak Gardens", "Caguas", "PR", "00725"),
    (2, "roger", "clark", "", "7922 Iron Oak Gardens", "Caguas", "PR", "00725"),
    (3, "mary", "norman", "", "547 Cinder Oak Glade", "Caguas", "PR", "00725"),
    (4, "james", "smith", "5550100", "12 North Elm Avenue", "Dallas", "TX", "75001"),
    (5, "jim", "smith", "5550100", "12 N Elm Ave", "Dallas", "TX", "75001"),
    (6, "ann", "lee", "", "99 Pine Road", "Austin", "TX", "73301"),
]

SCHEMA = (
    "customer_id int, first_name string, last_name string, phone_number string, "
    "street string, city string, state string, zip_code string"
)


@pytest.fixture(scope="module")
def matches(spark):
    from amp.address_pipeline import find_potential_matches

    candidates = spark.createDataFrame(RECORDS, SCHEMA)
    # query = record 1 resubmitted with a new id (the reference's
    # single-match flow: insert, then match against run 0)
    queries = spark.createDataFrame([(43, *RECORDS[0][1:])], SCHEMA)
    # NB threshold: the reference's 0.12 cosine-distance cut
    # (match.sql:79) is calibrated to spaCy's smooth embedding
    # geometry; the hashing-trick embedding is sharper (disjoint-name
    # records land at ~0.2 distance), so the test uses 0.35. The
    # parameter default stays 0.12 for citation parity.
    return find_potential_matches(
        candidates, queries, top_n=10, similarity_threshold=0.35
    ).collect()


def test_self_match_saturates(matches):
    from amp.reference_parity import composite_score

    by_cand = {r["candidate_id"]: r for r in matches}
    self_m = by_cand[1]
    assert self_m["rank"] == 1
    # score must equal the reference composite formula applied to the
    # row's own feature values (matcher.go:180-208)
    expected = composite_score(
        self_m["similarity"], self_m["tfidf_score"],
        self_m["trigram_cosine_first_name"], self_m["trigram_cosine_last_name"],
        self_m["trigram_cosine_street"], self_m["trigram_cosine_city"],
        self_m["trigram_cosine_phone_number"], self_m["trigram_cosine_zip_code"],
        self_m["bin_key_match"],
    )
    assert self_m["score"] == pytest.approx(expected, abs=1e-9)
    assert self_m["score"] == max(s["score"] for s in matches)
    assert self_m["bin_key_match"] is True
    assert self_m["similarity"] == pytest.approx(0.0, abs=1e-12)
    for f in ("first_name", "last_name", "street", "city", "zip_code"):
        assert self_m[f"trigram_cosine_{f}"] == pytest.approx(1.0, abs=1e-9)
    # empty-vs-empty phone -> 0.0 (ngram_similarity.go:97-100; NB the
    # reference README shows 1 here but its own code returns 0)
    assert self_m["trigram_cosine_phone_number"] == 0.0


def test_same_street_different_name_ranks_below_self(matches):
    by_cand = {r["candidate_id"]: r for r in matches}
    assert 2 in by_cand, "same-street candidate must be blocked in (zip pass)"
    roger = by_cand[2]
    assert roger["score"] < by_cand[1]["score"]
    assert roger["trigram_cosine_first_name"] == 0.0
    assert roger["trigram_cosine_street"] == pytest.approx(1.0, abs=1e-9)
    mary_self = by_cand[1]
    assert roger["rank"] > mary_self["rank"]


def test_blocking_excludes_other_state(matches):
    # TX records share no zip / state-city / state-phone block with the
    # PR query -> must not appear at all
    assert all(r["candidate_id"] not in (4, 5, 6) for r in matches)


def test_blocking_pairs_equal_or_predicate(spark):
    """The 3-pass rewrite must produce EXACTLY the match.sql:22-25
    OR-predicate pair set (checked against a literal cross-join filter
    at small scale — the proof in SURVEY.md §7.4.1)."""
    from amp.address_pipeline import _lowered, blocking_pairs

    cand = _lowered(spark.createDataFrame(RECORDS, SCHEMA))
    qry = _lowered(spark.createDataFrame(RECORDS, SCHEMA))
    got = {
        (r["query_id"], r["candidate_id"])
        for r in blocking_pairs(cand, qry).collect()
    }
    rows = [r.asDict() for r in cand.collect()]
    want = set()
    for q in rows:
        for c in rows:
            nonempty = lambda *vals: all(v != "" for v in vals)  # noqa: E731
            if (
                (nonempty(q["zip_code"]) and c["zip_code"] == q["zip_code"])
                or (
                    nonempty(q["state"], q["city"])
                    and c["state"] == q["state"] and c["city"] == q["city"]
                )
                or (
                    nonempty(q["state"], q["phone_number"])
                    and c["state"] == q["state"]
                    and c["phone_number"] == q["phone_number"]
                )
            ):
                want.add((q["customer_id"], c["customer_id"]))
    assert got == want


def test_blocking_pairs_literal_empty_string_semantics(spark):
    """exclude_empty_keys=False reproduces the LITERAL Postgres
    predicate, where '' = '' matches — two empty-phone records sharing a
    state DO pair (the deviation the default mode documents away).
    Ground truth here is the raw match.sql:22-25 boolean with no
    nonempty carve-out."""
    from amp.address_pipeline import _lowered, blocking_pairs

    # two empty-phone records sharing only a state: the literal
    # predicate pairs them via phone '' = '', the default mode does not
    extra = [
        (7, "kay", "ruiz", "", "1 A St", "Waco", "TX", "11111"),
        (8, "lee", "chan", "", "2 B St", "Plano", "TX", "22222"),
    ]
    cand = _lowered(spark.createDataFrame(RECORDS + extra, SCHEMA))
    got = {
        (r["query_id"], r["candidate_id"])
        for r in blocking_pairs(cand, cand, exclude_empty_keys=False).collect()
    }
    rows = [r.asDict() for r in cand.collect()]
    want = set()
    for q in rows:
        for c in rows:
            if (c["state"] == q["state"] or c["zip_code"] == q["zip_code"]) and (
                c["zip_code"] == q["zip_code"]
                or c["city"] == q["city"]
                or c["phone_number"] == q["phone_number"]
            ):
                want.add((q["customer_id"], c["customer_id"]))
    assert got == want
    # the deviation is real on this fixture: empty-phone + same-state
    # pairs appear only in literal mode
    strict = {
        (r["query_id"], r["candidate_id"])
        for r in blocking_pairs(cand, cand).collect()
    }
    assert strict < want
