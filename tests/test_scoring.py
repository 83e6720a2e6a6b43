"""Scenario S7 (FIXTURES.md §6): identity-confidence scores and
explanations, pinned to the Appendix-B formulas
(`Job.java::calculateAttributeIdentityConfidenceScore` /
`::calculateCompositeIdentityConfidenceScore`).
"""

import time

import pytest

from tests.conftest import make_docs
from zentity_spark.pipeline import ResolutionJob
from zentity_spark.plans.compiler import compile_model, Scope


def _collect(df, retries=3):
    """Deflake (VERDICT r2 "what's wrong" #5): ~20 min into the full
    suite, a collect here occasionally dies with a transient
    Py4JJavaError (JVM pressure); the identical plan re-executed
    immediately passes.  Retry the ACTION, not the test — a genuine
    logic failure still raises after the last attempt."""
    from py4j.protocol import Py4JJavaError
    for i in range(retries):
        try:
            return df.collect()
        except Py4JJavaError:
            if i == retries - 1:
                raise
            time.sleep(2)

DEFAULT_SCOPE = Scope(exclude_resolvers=("r_name_city_weak",))


@pytest.fixture(scope="module")
def plan(model):
    return compile_model(model, DEFAULT_SCOPE)


def conflate(s_by_attr: dict, attrs) -> float:
    """reference conflation, multiplied in the compiler's sorted-attr order
    so floats agree bitwise."""
    num = 1.0
    den = 1.0
    for a in sorted(attrs):
        s = s_by_attr.get(a, 0.5)
        num *= s
        den *= 1.0 - s
    return num / (num + den)


# --- identity scores (s = 0.5 + (attr_score - 0.5) * q_matcher * q_field) ---

@pytest.mark.parametrize("attr,matcher,expect", [
    ("name", "exact", 0.5 + 0.35 * 1.0 * 0.95),      # 0.8325
    ("name", "phonetic", 0.5 + 0.35 * 0.8 * 0.7),    # 0.696
    ("name", "fuzzy", 0.5 + 0.35 * 0.97 * 0.9),      # 0.80555
    ("dob", "dob_win", 0.5 + 0.45 * 0.9 * 1.0),      # 0.905
    ("phone", "exact", 0.99),
    ("email", "exact", 0.99),
])
def test_identity_scores(plan, attr, matcher, expect):
    assert plan.identity_score(attr, matcher) == pytest.approx(expect, rel=0, abs=0)


from hypothesis import given, strategies as st

scores = st.lists(st.floats(0.001, 0.999), min_size=1, max_size=6)


@given(ss=scores)
def test_conflation_bounds(ss):
    s_by = {f"a{i}": s for i, s in enumerate(ss)}
    S = conflate(s_by, sorted(s_by))
    assert 0.0 <= S <= 1.0


@given(ss=scores, idx=st.integers(0, 5), delta=st.floats(0.001, 0.3))
def test_conflation_monotone(ss, idx, delta):
    """raising any attribute score never lowers the composite."""
    idx = idx % len(ss)
    s_by = {f"a{i}": s for i, s in enumerate(ss)}
    S1 = conflate(s_by, sorted(s_by))
    s_by[f"a{idx}"] = min(0.999, ss[idx] + delta)
    S2 = conflate(s_by, sorted(s_by))
    assert S2 >= S1 - 1e-12


def test_conflation_identity_and_dominance(plan):
    # s=0.5 is the identity element; 1.0 dominates
    assert conflate({"a": 0.5}, ["a"]) == 0.5
    assert conflate({"a": 1.0, "b": 0.7}, ["a", "b"]) == 1.0
    assert conflate({"a": 0.0, "b": 0.7}, ["a", "b"]) == 0.0


# --- S7: pinned pair/doc scores + explanation rows on a 3-doc corpus ---

S7_SPEC = [
    ("a-000001", [("full_name", "tessa brook"), ("birth_date", "1984-03-02"),
                  ("tel", "15550001111")]),
    # same name (exact+phonetic+fuzzy all fire), dob +1d → r_name_dob
    ("b-000001", [("full_name", "tessa brook"), ("birth_date", "1984-03-03")]),
    # unrelated
    ("c-000001", [("full_name", "hollis vant"), ("tel", "15559998888")]),
]


@pytest.fixture(scope="module")
def s7_job(spark, model):
    return ResolutionJob(spark, make_docs(spark, S7_SPEC), model)


def test_s7_explanation_rows(s7_job):
    """per-(attribute, target field, matcher) lineage.  NOTE: no fuzzy row —
    fuzzy is bound to field full_name_alt (``model/IndexField.java``
    binding), and these docs carry names in full_name only; the reference's
    fuzzy leaf queries full_name_alt, which holds no value → cannot fire."""
    rows = {(r["doc_id_a"], r["doc_id_b"], r["resolver"], r["attr"],
             r["field"], r["matcher"])
            for r in _collect(s7_job.explanations())}
    assert rows == {
        ("a-000001", "b-000001", "r_name_dob", "name", "full_name", "exact"),
        ("a-000001", "b-000001", "r_name_dob", "name", "full_name", "phonetic"),
        ("a-000001", "b-000001", "r_name_dob", "dob", "birth_date", "dob_win"),
    }


def test_s7_pair_score_pinned(s7_job, plan):
    rows = _collect(s7_job.pair_scores())
    assert len(rows) == 1
    got = rows[0]
    assert (got["doc_id_a"], got["doc_id_b"]) == ("a-000001", "b-000001")
    expect = conflate({"name": 0.8325, "dob": 0.905}, plan.scored_attrs())
    assert got["score"] == pytest.approx(expect, rel=1e-12)
    assert 0.97 < got["score"] < 0.99


def test_s7_doc_scores(s7_job, plan):
    got = {r["doc_id"]: r["score"] for r in _collect(s7_job.doc_scores())}
    expect = conflate({"name": 0.8325, "dob": 0.905}, plan.scored_attrs())
    assert got == {"a-000001": pytest.approx(expect),
                   "b-000001": pytest.approx(expect)}


def test_s7_explanation_structs(s7_job):
    rows = {r["doc_id"]: r["explanation"]
            for r in _collect(s7_job.explanation_structs())}
    assert set(rows) == {"a-000001", "b-000001"}
    a = rows["a-000001"]
    assert len(a) == 3
    assert {e["matcher"] for e in a} == {"exact", "phonetic", "dob_win"}
    assert all(e["other_doc"] == "b-000001" for e in a)


def test_missing_attr_score_contributes_nothing(spark):
    """absent attr score → no contribution (Appendix B): a model whose only
    matched attribute has no score yields the 0.5 identity."""
    from zentity_spark.model import Model
    m = Model.parse("""
    {
      "attributes": {"code": {"type": "string"}},
      "resolvers": {"r": {"attributes": ["code"]}},
      "matchers": {"x": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
      "indices": {"a": {"fields": {"code": {"attribute": "code", "matcher": "x"}}}}
    }
    """)
    docs = make_docs(spark, [
        ("a-000001", [("code", "Z9")]),
        ("a-000002", [("code", "Z9")]),
    ])
    job = ResolutionJob(spark, docs, m, scope=Scope())
    rows = job.pair_scores().collect()
    assert len(rows) == 1
    assert rows[0]["score"] == 0.5


# --- per-index score granularity (VERDICT r2 "what's missing" #2): two
# sources declaring the SAME (field, matcher) binding at DIFFERENT
# qualities — each side of a pair is scored with its own source's quality

def test_per_source_quality_applied(spark):
    import json
    from zentity_spark.model import Model
    spec = {
        "attributes": {"who": {"type": "string", "score": 0.8,
                               "params": {"normalizer": "name"}}},
        "resolvers": {"r_who": {"attributes": ["who"]}},
        "matchers": {"exact": {"clause": {"term": {"{{ field }}": "{{ value }}"}},
                               "quality": 1.0}},
        "indices": {
            "a": {"fields": {"who_name": {"attribute": "who",
                                          "matcher": "exact",
                                          "quality": 1.0}}},
            "b": {"fields": {"who_name": {"attribute": "who",
                                          "matcher": "exact",
                                          "quality": 0.5}}},
        },
    }
    m = Model.parse(json.dumps(spec))
    docs = make_docs(spark, [
        ("a-000001", [("who_name", "rhea voss")]),
        ("b-000001", [("who_name", "rhea voss")]),
    ])
    job = ResolutionJob(spark, docs, m)
    ex = job.explanations().collect()
    assert len(ex) == 1
    row = ex[0]
    # s = 0.5 + (0.8 - 0.5) * q_matcher * q_field, per SIDE
    assert row["s_a"] == pytest.approx(0.5 + 0.3 * 1.0 * 1.0)   # source a
    assert row["s_b"] == pytest.approx(0.5 + 0.3 * 1.0 * 0.5)   # source b
    # doc scores: each doc conflates ITS OWN side's evidence
    ds = {r["doc_id"]: r["score"] for r in job.doc_scores().collect()}
    assert ds["a-000001"] == pytest.approx(0.8)
    assert ds["b-000001"] == pytest.approx(0.65)
    # pair score: best evidence across the two directions
    ps = job.pair_scores().collect()
    assert len(ps) == 1 and ps[0]["score"] == pytest.approx(0.8)
    # response explanation structs carry the per-source s
    structs = {r["doc_id"]: r["explanation"]
               for r in job.explanation_structs().collect()}
    assert structs["a-000001"][0]["s"] == pytest.approx(0.8)
    assert structs["b-000001"][0]["s"] == pytest.approx(0.65)
