"""Typed-value canonicalization (number/boolean attributes, SURVEY row 28)
and the ngram matcher end-to-end (row 11).
"""

import duckdb
import pytest

from tests.conftest import clusters_of, make_docs
from zentity_spark import dialect as D
from zentity_spark.model import Model
from zentity_spark.pipeline import ResolutionJob
from zentity_spark.plans.compiler import Scope


def _agree(spark, build, values):
    rows = ", ".join("('" + v.replace("'", "''") + "')" for v in values)
    s = [r["v"] for r in spark.sql(
        f"SELECT {build('c', D.SPARK)} AS v FROM (VALUES {rows}) AS t(c)"
    ).collect()]
    d = [r[0] for r in duckdb.connect().execute(
        f"SELECT {build('c', D.DUCKDB)} AS v FROM (VALUES {rows}) AS t(c)"
    ).fetchall()]
    assert s == d, f"spark={s} duck={d}"
    return s


def test_number_canonicalization_agree(spark):
    got = _agree(spark, D.norm_number,
                 ["3.10", "3.1", " 0.31e1", "7", "-2.50", "abc",
                  "1e-7", "0.0000001", "nan", "inf"])
    # fractional canonical form is an EXPLICIT shared %.12e render — bare
    # double→string casts disagree across engines ('1.0E-7' vs '1e-07')
    assert got[0] == got[1] == got[2] == "3.100000000000e+00"
    assert got[3] == "7"
    assert got[4] == "-2.500000000000e+00"
    assert got[5] is None
    assert got[6] == got[7] == "1.000000000000e-07"
    assert got[8] is None and got[9] is None


def test_bool_canonicalization_agree(spark):
    got = _agree(spark, D.norm_bool, ["True", " FALSE ", "true", "nope"])
    assert got[:3] == ["true", "false", "true"]
    assert got[3] is None


NUM_MODEL = """
{
  "attributes": {"amount": {"type": "number"}, "vip": {"type": "boolean"},
                 "acct": {"type": "string"}},
  "resolvers": {"r": {"attributes": ["acct", "amount", "vip"]}},
  "matchers": {"x": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
  "indices": {"a": {"fields": {
    "acct": {"attribute": "acct", "matcher": "x"},
    "amount": {"attribute": "amount", "matcher": "x"},
    "vip": {"attribute": "vip", "matcher": "x"}}}}
}
"""


def test_number_boolean_resolution(spark):
    """docs with differently-formatted but numerically-equal values match
    (value identity = canonical serialized form)."""
    m = Model.parse(NUM_MODEL)
    docs = make_docs(spark, [
        ("a-000001", [("acct", "K9"), ("amount", "3.10"), ("vip", "True")]),
        ("a-000002", [("acct", "K9"), ("amount", "3.1"), ("vip", "true")]),
        ("a-000003", [("acct", "K9"), ("amount", "4"), ("vip", "true")]),
    ])
    got = clusters_of(ResolutionJob(spark, docs, m, scope=Scope()).clusters())
    assert got == {frozenset({"a-000001", "a-000002"}),
                   frozenset({"a-000003"})}


NGRAM_MODEL = """
{
  "attributes": {"title": {"type": "string",
                           "params": {"normalizer": "name"}}},
  "resolvers": {"r": {"attributes": ["title"]}},
  "matchers": {"ng": {"type": "ngram",
                      "params": {"n": 3, "jaccard": 0.55}}},
  "indices": {"a": {"fields": {
    "title": {"attribute": "title", "matcher": "ng"}}}}
}
"""


def test_ngram_matcher_end_to_end(spark):
    """character-ngram blocking + Jaccard verify: substring-tolerant match
    (≙ ES ngram-analyzed subfield, SURVEY row 11)."""
    m = Model.parse(NGRAM_MODEL)
    docs = make_docs(spark, [
        ("a-000001", [("title", "international widget corporation")]),
        ("a-000002", [("title", "internationale widget corporation")]),
        ("a-000003", [("title", "completely different name here")]),
    ])
    got = clusters_of(ResolutionJob(spark, docs, m, scope=Scope()).clusters())
    assert got == {frozenset({"a-000001", "a-000002"}),
                   frozenset({"a-000003"})}


@pytest.mark.slow
def test_f1_gate_sf001(spark, model):
    """the BASELINE F1 gate at the driver's compare scale (sf0.01):
    predicted partition == person partition exactly."""
    import os
    from pyspark.sql import functions as F
    from zentity_spark.synth import corpus_dir
    d = corpus_dir("sf0.01")
    docs = spark.read.parquet(os.path.join(d, "docs_spans.parquet"))
    clusters = ResolutionJob(spark, docs, model).clusters()
    truth = spark.read.parquet(os.path.join(d, "doc_truth.parquet"))
    j = clusters.join(truth, "doc_id")
    assert (j.groupBy("person_id").agg(F.countDistinct("entity_id").alias("n"))
            .where("n > 1").count()) == 0
    assert (j.groupBy("entity_id").agg(F.countDistinct("person_id").alias("n"))
            .where("n > 1").count()) == 0


def test_date_format_param_cross_engine(spark):
    """norm_date honors the model's date format param in both dialects;
    unparseable values → NULL (not an error)."""
    vals = ["02/03/1984", "31/12/1999", "1984-03-02", "nope"]
    got = _agree(spark, lambda c, d: D.norm_date(c, d, "dd/MM/yyyy"), vals)
    assert got == ["1984-03-02", "1999-12-31", None, None]


DMY_MODEL = """
{
  "attributes": {"dob": {"type": "date",
                         "params": {"format": "dd/MM/yyyy"}},
                 "acct": {"type": "string"}},
  "resolvers": {"r": {"attributes": ["acct", "dob"]}},
  "matchers": {"x": {"clause": {"term": {"{{ field }}": "{{ value }}"}}},
               "win": {"clause": {"range": {"{{ field }}": {
                   "gte": "{{ value }}||-{{ params.window }}",
                   "lte": "{{ value }}||+{{ params.window }}"}}},
                "params": {"window": "2d"}}},
  "indices": {"a": {"fields": {
    "acct": {"attribute": "acct", "matcher": "x"},
    "born": {"attribute": "dob", "matcher": "win"}}}}
}
"""


def test_non_iso_date_format_end_to_end(spark):
    """a model with dd/MM/yyyy dates: values are parsed (NOT silently
    dropped) and the date-window matcher works on the canonical form."""
    m = Model.parse(DMY_MODEL)
    docs = make_docs(spark, [
        ("a-000001", [("acct", "K1"), ("born", "02/03/1984")]),
        ("a-000002", [("acct", "K1"), ("born", "03/03/1984")]),  # +1d → in window
        ("a-000003", [("acct", "K1"), ("born", "20/07/1984")]),  # far → out
    ])
    job = ResolutionJob(spark, docs, m, scope=Scope())
    vals = {(r["doc_id"], r["value_norm"])
            for r in job.attrs().where("attr = 'dob'").collect()}
    assert vals == {("a-000001", "1984-03-02"), ("a-000002", "1984-03-03"),
                    ("a-000003", "1984-07-20")}
    got = clusters_of(job.clusters())
    assert got == {frozenset({"a-000001", "a-000002"}),
                   frozenset({"a-000003"})}
