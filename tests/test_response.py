"""Response assembly (SURVEY rows 5/33): hit payload toggles
`_attributes` / `_score` / `_explanation` / `_source` on a seeded
resolution — ≙ the REST response options of the reference
(`ResolutionAction.java::prepareRequest` URL params, row 31).
"""

import pytest

from tests.conftest import make_docs
from zentity_spark.pipeline import ResolutionJob

SPEC = [
    ("a-000001", [("full_name", "vera lund"), ("tel", "15551230009"),
                  ("email", "vl@x.example")]),
    ("b-000001", [("full_name", "vera lund"), ("tel", "1-555-123-0009")]),
    ("c-000001", [("email", "VL@x.example")]),
    ("a-000002", [("full_name", "someone else"), ("tel", "15550000000")]),
]


@pytest.fixture(scope="module")
def job(spark, model):
    return ResolutionJob(spark, make_docs(spark, SPEC), model)


def test_full_response(job):
    rows = {r["doc_id"]: r for r in job.response(
        attributes={"name": ["Vera Lund"], "phone": ["15551230009"]},
        max_hops=5, include_explanation=True).collect()}
    assert set(rows) == {"a-000001", "b-000001", "c-000001"}
    assert rows["a-000001"]["hop"] == 0
    assert rows["b-000001"]["hop"] == 0
    assert rows["c-000001"]["hop"] == 1          # via shared email
    # _attributes: harvested multi-valued, normalized
    attrs = rows["a-000001"]["attributes"]
    assert attrs["name"] == ["vera lund"]
    assert attrs["phone"] == ["15551230009"]
    # _score present and in (0.5, 1]
    assert 0.5 < rows["a-000001"]["score"] <= 1.0
    # _explanation rows and _source spans present
    assert len(rows["a-000001"]["explanation"]) > 0
    assert rows["a-000001"]["spans"][0]["text"] == "full_name=vera lund"


def test_response_toggles(job):
    df = job.response(ids=["a-000002"], include_attributes=False,
                      include_score=False, include_source=False)
    assert set(df.columns) == {"doc_id", "hop", "q"}
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["hop"] == 0 and rows[0]["q"] == 0
