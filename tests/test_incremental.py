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


def _inc_dirs(r):
    root = r._path("labels")
    return sorted((d for d in os.listdir(root) if d.startswith("inc=")),
                  key=lambda d: int(d.split("=")[1]))


def _chain_corpus(spark):
    """bootstrap: an Alicia pair + an untouched Carol pair; two one-doc
    increments that each extend the Alicia component."""
    base = make_docs(spark, [
        ("a-000001", [("full_name", "Alicia Keys"),
                      ("birth_date", "1981-01-25")]),
        ("b-000001", [("full_name", "Alicia Keys"),
                      ("birth_date", "1981-01-25")]),
        ("a-000007", [("full_name", "Carol Chan"),
                      ("birth_date", "1970-02-02")]),
        ("a-000008", [("full_name", "Carol Chan"),
                      ("birth_date", "1970-02-02")]),
    ])
    d1 = make_docs(spark, [
        ("a-000002", [("full_name", "Alicia Keys"),
                      ("birth_date", "1981-01-25")])])
    d2 = make_docs(spark, [
        ("a-000003", [("full_name", "Alicia Keys"),
                      ("birth_date", "1981-01-25")])])
    return base, d1, d2


def test_fold_commits_only_relabeled_components(spark, model, tmp_path):
    """the labels table is delta-partitioned: a fold WRITES only the
    touched components (O(Δ), not O(N)); untouched components are served
    from older incs by the latest-wins view."""
    base, d1, d2 = _chain_corpus(spark)
    r = IncrementalResolver(spark, model, str(tmp_path / "st"),
                            auto_compact_ratio=None)
    r.add(base)
    r.add(d1)
    r.add(d2)
    assert _inc_dirs(r) == ["inc=0", "inc=1", "inc=2"]
    ids = lambda fold: {x["doc_id"] for x in r.storage.read(
        r._part("labels", fold)).select("doc_id").collect()}
    # each fold rewrote ONLY the Alicia component, never Carol's
    assert ids(1) == {"a-000001", "b-000001", "a-000002"}
    assert ids(2) == {"a-000001", "b-000001", "a-000002", "a-000003"}
    lab = dict(_labels(r.labels()))
    assert lab["a-000007"] == lab["a-000008"]  # served from inc=0
    job = ResolutionJob(spark, base.unionByName(d1).unionByName(d2), model)
    assert _labels(r.clusters()) == _labels(job.clusters())
    job.unpersist()


def test_single_inc_label_read_has_no_shuffle(spark, model, tmp_path):
    """right after compaction (bootstrap included) the labels table is a
    single inc, so the latest-wins aggregate is a no-op — labels() must
    be a plain scan with NO Exchange/HashAggregate (at sf1 the needless
    aggregate added ~O(N) shuffle to every fold's old-label read)."""
    base, d1, _d2 = _chain_corpus(spark)
    r = IncrementalResolver(spark, model, str(tmp_path / "st"),
                            auto_compact_ratio=None)
    r.add(base)
    plan = r.labels()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "HashAggregate" not in plan
    # two incs, small delta: base must stream through an ANTI-JOIN against
    # the broadcast delta ids — never a full-table latest-wins shuffle
    r.add(d1)
    plan2 = r.labels()._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan2 and "Broadcast" in plan2


def test_multi_inc_label_read_falls_back_when_delta_large(
        spark, model, tmp_path):
    """with auto-broadcast disabled the delta-broadcast budget is 0, so
    the multi-inc read must fall back to the full latest-wins aggregate
    (and still serve the same labels)."""
    base, d1, _d2 = _chain_corpus(spark)
    r = IncrementalResolver(spark, model, str(tmp_path / "st"),
                            auto_compact_ratio=None)
    r.add(base)
    r.add(d1)
    fast = _labels(r.labels())
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = r.labels()._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" not in plan
        assert "max_by" in plan or "HashAggregate" in plan
        assert _labels(r.labels()) == fast
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_label_auto_compaction(spark, model, tmp_path):
    """ratio-gated compaction folds the view into one inc and drops the
    older partitions, with the served labels unchanged."""
    base, d1, d2 = _chain_corpus(spark)
    r = IncrementalResolver(spark, model, str(tmp_path / "st"),
                            auto_compact_ratio=0.5)
    r.add(base)          # bootstrap compacts by definition: base_rows=4
    r.add(d1)            # delta 3 rows > 0.5×4 → compact into inc=1
    assert _inc_dirs(r) == ["inc=1"]
    r.add(d2)            # delta 4 rows > 0.5×5 → compact into inc=2
    assert _inc_dirs(r) == ["inc=2"]
    job = ResolutionJob(spark, base.unionByName(d1).unionByName(d2), model)
    assert _labels(r.clusters()) == _labels(job.clusters())
    job.unpersist()


def test_stream_resolve_folds_backlog(spark, model, tmp_path):
    """two landing files drained with availableNow == one batch resolve."""
    from zentity_spark.streaming.resolve import stream_resolve
    spec1 = [
        ("a-000001", [("full_name", "Alicia Keys"),
                      ("birth_date", "1981-01-25")]),
        ("b-000001", [("full_name", "Alicia Keys"),
                      ("birth_date", "1981-01-25")]),
    ]
    spec2 = [
        ("a-000002", [("full_name", "Alicia Keys"),
                      ("birth_date", "1981-01-27")]),
        ("c-000009", [("full_name", "Nobody Here"),
                      ("birth_date", "1999-09-09")]),
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


def test_incremental_wide_cc_ids_identical_labels(spark, model, split,
                                                  tmp_path):
    """wide_cc_ids reaches the incremental fold (the 10¹²-doc operating
    mode is exactly the one that needs the collision margin): bootstrap +
    fold under 128-bit node ids produce the identical label map."""
    base, delta = split
    r = IncrementalResolver(spark, model, str(tmp_path / "st"),
                            wide_cc_ids=True)
    r.add(base)
    r.add(delta)
    job = ResolutionJob(spark, base.unionByName(delta), model)
    batch = _labels(job.clusters())
    job.unpersist()
    assert _labels(r.clusters()) == batch
