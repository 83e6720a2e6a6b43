"""Scenario S8 (FIXTURES §6) + input-parsing parity: terms type-sniffing
(≙ input/Term.java), attribute seeding via first-hop matching, ids
seeding, combined inputs.
"""

import pytest

from tests.conftest import make_docs
from zentity_spark.input import build_probe, term_accepts
from zentity_spark.model import Attribute
from zentity_spark.pipeline import ResolutionJob


# --- term type sniffing (Term.java::isNumber/isBoolean/isDate) ---

@pytest.mark.parametrize("typ,term,ok", [
    ("string", "anything", True),
    ("number", "3.14", True),
    ("number", "-2e5", True),
    ("number", "abc", False),
    ("boolean", "true", True),
    ("boolean", "False", True),
    ("boolean", "yes", False),
    ("date", "1984-03-02", True),
    ("date", "03/02/1984", False),
])
def test_term_accepts(typ, term, ok):
    a = Attribute(name="x", type=typ,
                  params={"format": "yyyy-MM-dd"} if typ == "date" else {})
    assert term_accepts(a, term) is ok


S8_SPEC = [
    ("a-000001", [("full_name", "kira moss"), ("tel", "1555 777-0001"),
                  ("birth_date", "1984-03-02")]),
    ("b-000001", [("full_name", "kira moss"), ("tel", "15557770001")]),
    ("a-000002", [("full_name", "kira moss"), ("tel", "15559990002"),
                  ("birth_date", "1990-01-01")]),   # same name, diff rest
    ("c-000001", [("email", "km@x.example")]),
]


@pytest.fixture(scope="module")
def s8_job(spark, model):
    return ResolutionJob(spark, make_docs(spark, S8_SPEC), model)


def test_probe_normalization(spark, s8_job):
    probe, params = build_probe(spark, s8_job.plan,
                                attributes={"name": ["  Kira  MOSS!"],
                                            "phone": ["+1 (555) 777-0001"]})
    assert probe == {"name": ["kira moss"], "phone": ["15557770001"]}
    assert params == {}


def test_probe_input_params_cascade(spark, s8_job):
    """input attributes may carry per-request matcher params
    (input/Attribute.java::params — the rightmost level of the cascade)."""
    probe, params = build_probe(spark, s8_job.plan, attributes={
        "name": {"values": ["Kira Moss"], "params": {"fuzziness": "2"}},
        "phone": ["+1 (555) 777-0001"],
    })
    assert probe == {"name": ["kira moss"], "phone": ["15557770001"]}
    assert params == {"name": {"fuzziness": "2"}}


def test_terms_coerced_to_types(spark, s8_job):
    probe, _ = build_probe(spark, s8_job.plan, terms=["1984-03-02"])
    # the date attr parses it; phone keeps digits; email keeps it verbatim;
    # the name normalizer strips digits/punctuation to '' → dropped
    assert probe["dob"] == ["1984-03-02"]
    assert probe["phone"] == ["19840302"]
    assert probe["email"] == ["1984-03-02"]
    assert "name" not in probe


def test_seed_docs_by_attributes(spark, s8_job):
    """(name, phone) input seeds exactly the docs matching resolver
    r_name_phone — the same-name-different-phone distractor stays out."""
    seeds = {r["doc_id"] for r in s8_job.seed_docs(
        attributes={"name": ["Kira Moss"], "phone": ["+1 (555) 777-0001"]}
    ).collect()}
    assert seeds == {"a-000001", "b-000001"}


def test_seed_docs_insufficient_input(spark, s8_job):
    """name alone satisfies no active resolver (r_name_dob needs dob,
    r_name_phone needs phone) → no seeds, ≙ zentity returning nothing when
    no resolver is queryable from the input."""
    seeds = s8_job.seed_docs(attributes={"name": ["kira moss"]})
    assert seeds.count() == 0


def test_resolve_input_attributes(spark, s8_job):
    got = {r["doc_id"]: r["hop"] for r in s8_job.resolve_input(
        attributes={"name": ["kira moss"], "phone": ["15557770001"]},
        max_hops=5).collect()}
    assert set(got) == {"a-000001", "b-000001"}
    assert all(h == 0 for h in got.values())


def test_resolve_input_ids(spark, s8_job):
    got = {r["doc_id"]: r["hop"] for r in s8_job.resolve_input(
        ids=["a-000002"], max_hops=5).collect()}
    assert got == {"a-000002": 0}


def test_resolve_input_terms(spark, s8_job):
    """a term that parses as a date seeds dob; with a name attribute it
    satisfies r_name_dob."""
    got = {r["doc_id"] for r in s8_job.resolve_input(
        attributes={"name": ["kira moss"]}, terms=["1984-03-02"],
        max_hops=5).collect()}
    assert got == {"a-000001", "b-000001"}  # b via snowball hop 1


def test_resolve_input_requires_something(s8_job):
    with pytest.raises(ValueError):
        s8_job.resolve_input()
