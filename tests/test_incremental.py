"""Incremental resolution (operators/incremental.py): the fold contract
bootstrap(D); add(Δ) == batch(D ∪ Δ), touched-component-only re-clustering,
Δ-side broadcast, and the Structured Streaming wrapper.

The reference has no increment notion (per-request resolution); the batch
equivalence oracle is our own pipeline (itself oracle-checked against
DuckDB in CORRECTNESS_r*.json) — so these tests pin incremental == batch,
and the driver query ``er_increment_clusters`` pins incremental == DuckDB
recursive-CTE clustering directly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zentity_spark.operators.incremental import IncrementalResolver
from zentity_spark.pipeline import ResolutionJob

from tests.conftest import make_docs


def _labels(df):
    return sorted((r["doc_id"], r["entity_id"])
                  for r in df.select("doc_id", "entity_id").collect())


@pytest.fixture(scope="module")
def split(spark, docs_sf0001):
    base = docs_sf0001.where("pmod(xxhash64(doc_id), 5) < 4")
    delta = docs_sf0001.where("pmod(xxhash64(doc_id), 5) >= 4")
    assert delta.count() > 10
    return base, delta


@pytest.fixture(scope="module")
def folded(spark, model, split, tmp_path_factory):
    """bootstrap(base) then add(delta), plus the batch reference run."""
    base, delta = split
    state = str(tmp_path_factory.mktemp("inc_state"))
    r = IncrementalResolver(spark, model, state)
    r.add(base)
    base_labels = _labels(r.clusters())
    r.add(delta)
    job = ResolutionJob(spark, base.unionByName(delta), model)
    batch = _labels(job.clusters())
    inc = _labels(r.clusters())
    job.unpersist()
    return r, base_labels, inc, batch


def test_incremental_equals_batch(folded):
    _r, _base, inc, batch = folded
    assert inc == batch


def test_delta_pairs_broadcast_and_nonempty(folded):
    r, _base, _inc, _batch = folded
    # the Δ key probe must be a broadcast hash join (no reshuffle of the
    # combined key table for a small increment)
    assert "BroadcastHashJoin" in (r.last_pairs_plan or "")
    # the increment actually linked documents (the fixture interleaves
    # persons across sources, so a 20% slice has cross-slice matches)
    assert r.last_delta_edges > 0


def test_untouched_components_preserved(folded):
    r, base_labels, inc, _batch = folded
    touched_entities = set()
    base_map = dict(base_labels)
    inc_map = dict(inc)
    # docs whose label changed between folds belong to touched components;
    # every doc whose OLD component got no new member keeps its exact label
    changed = {d for d, e in base_map.items() if inc_map.get(d) != e}
    untouched = {d for d in base_map if d not in changed}
    assert len(untouched) > 0
    for d in sorted(untouched)[:50]:
        assert inc_map[d] == base_map[d]


def test_three_way_fold(spark, model, docs_sf0001, tmp_path):
    parts = [docs_sf0001.where(f"pmod(xxhash64(doc_id), 3) = {i}")
             for i in range(3)]
    r = IncrementalResolver(spark, model, str(tmp_path / "st"))
    for p in parts:
        r.add(p)
    job = ResolutionJob(spark, docs_sf0001, model)
    assert _labels(r.clusters()) == _labels(job.clusters())
    job.unpersist()


def test_stream_resolve_folds_backlog(spark, model, tmp_path):
    """two landing files drained with availableNow == one batch resolve."""
    from zentity_spark.streaming.resolve import stream_resolve
    spec1 = [
        ("a-000001", [("name", "Alicia Keys"), ("dob", "1981-01-25")]),
        ("b-000001", [("full_name", "Alicia Keys"), ("birth_date", "1981-01-25")]),
    ]
    spec2 = [
        ("a-000002", [("name", "Alicia Keys"), ("dob", "1981-01-27")]),
        ("c-000009", [("name", "Nobody Here"), ("dob", "1999-09-09")]),
    ]
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, spec in enumerate((spec1, spec2)):
        (make_docs(spark, spec)
         .withColumn("event_ts", F.current_timestamp())
         .write.parquet(os.path.join(landing, f"drop{i}")))
    q, resolver = stream_resolve(
        spark, os.path.join(landing, "*"), str(tmp_path / "state"),
        model, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(120)
    all_docs = make_docs(spark, spec1 + spec2)
    job = ResolutionJob(spark, all_docs, model)
    assert _labels(resolver.clusters()) == _labels(job.clusters())
    job.unpersist()
