"""Jaro-Winkler: numpy batch implementation vs textbook oracle
(hypothesis property test), vs DuckDB's builtin (oracle-parity pin), and
as a registered Spark pandas UDF used by a jaro_winkler matcher.
"""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from zentity_spark.functions.similarity import (
    jaro_winkler_np,
    jaro_winkler_py,
    register_similarity_udfs,
)

CASES = [
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("", "", 0.0),
    ("a", "", 0.0),
]


@pytest.mark.parametrize("a,b,expect", CASES)
def test_known_values(a, b, expect):
    assert jaro_winkler_py(a, b) == pytest.approx(expect, abs=1e-12)
    got = jaro_winkler_np([a], [b])[0]
    assert got == pytest.approx(expect, abs=1e-12)


names = st.text(alphabet="abcdefgh ", min_size=0, max_size=12)


@settings(max_examples=300, deadline=None)
@given(a=names, b=names)
def test_np_matches_py_oracle(a, b):
    got = jaro_winkler_np([a], [b])[0]
    expect = jaro_winkler_py(a, b)
    assert got == pytest.approx(expect, abs=1e-12)


@settings(max_examples=150, deadline=None)
@given(a=names, b=names)
def test_matches_duckdb_builtin(a, b):
    """pin our implementation to DuckDB's jaro_winkler_similarity — this is
    what lets jaro_winkler matchers keep a DuckDB oracle."""
    con = duckdb.connect()
    expect = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    got = jaro_winkler_np([a], [b])[0]
    assert got == pytest.approx(expect, abs=1e-9)


def test_batch_consistency():
    a = ["martha", "dixon", "", "same"]
    b = ["marhta", "dicksonx", "x", "same"]
    batch = jaro_winkler_np(a, b)
    single = np.array([jaro_winkler_np([x], [y])[0] for x, y in zip(a, b)])
    assert np.allclose(batch, single, atol=1e-12)


def test_symmetry():
    for a, b, _ in CASES:
        assert jaro_winkler_np([a], [b])[0] == pytest.approx(
            jaro_winkler_np([b], [a])[0], abs=1e-12)


def test_spark_udf_and_matcher(spark, model):
    register_similarity_udfs(spark)
    rows = spark.sql(
        "SELECT jaro_winkler_sim('martha', 'marhta') AS s").collect()
    assert rows[0]["s"] == pytest.approx(0.9611111111111111, abs=1e-12)

    # a jaro_winkler matcher end-to-end: same-phonetic-block name variants
    from tests.conftest import clusters_of, make_docs
    from zentity_spark.model import Model
    from zentity_spark.pipeline import ResolutionJob
    from zentity_spark.plans.compiler import Scope
    m = Model.parse("""
    {
      "attributes": {"name": {"type": "string", "score": 0.9,
                              "params": {"normalizer": "name"}}},
      "resolvers": {"r": {"attributes": ["name"]}},
      "matchers": {"jw": {"type": "jaro_winkler",
                          "params": {"threshold": 0.93}, "quality": 0.9}},
      "indices": {"a": {"fields": {"full_name": {"attribute": "name",
                                                 "matcher": "jw"}}}}
    }
    """)
    docs = make_docs(spark, [
        ("a-000001", [("full_name", "martha stone")]),
        ("a-000002", [("full_name", "marhta stone")]),
        ("a-000003", [("full_name", "zelda brook")]),
    ])
    job = ResolutionJob(spark, docs, m, scope=Scope())
    got = clusters_of(job.clusters())
    assert got == {frozenset({"a-000001", "a-000002"}),
                   frozenset({"a-000003"})}
