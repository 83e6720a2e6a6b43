"""End-to-end pipeline tests on the sf0.001 fixture corpus (FIXTURES.md §5):
golden-cluster F1, DuckDB stage agreement, span passthrough, determinism.
≙ the reference's `ResolutionActionIT` scenario layer (SURVEY.md §6).
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from zentity_spark import dialect as D
from zentity_spark.pipeline import ResolutionJob
from zentity_spark.plans.compiler import compile_model, Scope


@pytest.fixture(scope="module")
def job(spark, docs_sf0001, model):
    return ResolutionJob(spark, docs_sf0001, model)


@pytest.fixture(scope="module")
def clusters(job):
    df = job.clusters()
    df.cache().count()
    return df


def pair_f1(labeled, cluster_rows):
    """pairwise P/R/F1 of predicted clusters against labeled pairs
    (the BASELINE metric: F1 on labeled pairs at the same blocking key)."""
    ent = {r["doc_id"]: r["entity_id"] for r in cluster_rows}
    tp = fp = fn = 0
    for r in labeled:
        same = ent.get(r["doc_id_a"]) == ent.get(r["doc_id_b"])
        if r["label"] == 1 and same:
            tp += 1
        elif r["label"] == 1:
            fn += 1
        elif same:
            fp += 1
    p = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    return 2 * p * rec / (p + rec) if p + rec else 0.0


def test_f1_on_labeled_pairs(spark, sf0001_dir, clusters):
    labeled = spark.read.parquet(
        os.path.join(sf0001_dir, "labeled_pairs.parquet")).collect()
    f1 = pair_f1(labeled, clusters.select("doc_id", "entity_id").collect())
    assert f1 >= 0.99, f"pairwise F1 {f1} below BASELINE gate"


def test_metrics_module_agrees(spark, sf0001_dir, clusters):
    from zentity_spark.metrics import pairwise_f1, partition_quality
    labeled = spark.read.parquet(
        os.path.join(sf0001_dir, "labeled_pairs.parquet"))
    m = pairwise_f1(clusters, labeled)
    assert m["f1"] >= 0.99 and m["fp"] == 0 and m["fn"] == 0
    truth = spark.read.parquet(os.path.join(sf0001_dir, "doc_truth.parquet"))
    q = partition_quality(clusters, truth)
    assert q == {"split_persons": 0, "merged_entities": 0}


def test_clusters_match_person_truth_exactly(spark, sf0001_dir, clusters):
    """stronger than the F1 gate: predicted partition == person partition."""
    truth = spark.read.parquet(os.path.join(sf0001_dir, "doc_truth.parquet"))
    j = clusters.join(truth, "doc_id")
    n_bad_split = (j.groupBy("person_id")
                   .agg(F.countDistinct("entity_id").alias("n"))
                   .where("n > 1").count())
    n_bad_merge = (j.groupBy("entity_id")
                   .agg(F.countDistinct("person_id").alias("n"))
                   .where("n > 1").count())
    assert n_bad_split == 0, "a person was split across entities"
    assert n_bad_merge == 0, "an entity merged multiple persons"


def test_every_doc_labeled_once(docs_sf0001, clusters):
    assert clusters.count() == docs_sf0001.count()
    assert clusters.where(F.col("entity_id").isNull()).count() == 0
    assert clusters.groupBy("doc_id").count().where("count > 1").count() == 0


def test_span_passthrough_invariant(docs_sf0001, clusters):
    """per-row span-sequence equality (kind, text, media_ref, order) —
    BASELINE.json input_hint invariant, 100% of rows."""
    a = docs_sf0001.select("doc_id", F.col("spans").alias("in_spans"))
    b = clusters.select("doc_id", F.col("spans").alias("out_spans"))
    j = a.join(b, "doc_id", "full")
    mism = j.where(
        F.col("in_spans").isNull() | F.col("out_spans").isNull() |
        (F.expr(
            "transform(in_spans, s -> struct(s.kind, s.text, s.media_ref)) != "
            "transform(out_spans, s -> struct(s.kind, s.text, s.media_ref))"))
    ).count()
    assert mism == 0


def test_determinism(job, clusters):
    again = job.clusters()
    d1 = clusters.select("doc_id", "entity_id")
    d2 = again.select("doc_id", "entity_id")
    assert d1.exceptAll(d2).count() == 0
    assert d2.exceptAll(d1).count() == 0


@pytest.mark.parametrize("stage", ["attrs_x", "keys_x", "pairs_x", "match_edges_x"])
def test_duckdb_stage_agreement(spark, sf0001_dir, model, job, stage):
    """each compiled stage returns identical row multisets in both dialects
    (the mechanism behind __spark_entry__.oracle_sql)."""
    plan = job.plan
    cols = {
        "attrs_x": "doc_id, attr, value_norm",
        "keys_x": "doc_id, attr, key",
        "pairs_x": "doc_id_a, doc_id_b, resolver",
        "match_edges_x": "doc_id_a, doc_id_b, resolver",
    }[stage]
    sel = f"SELECT {cols} FROM {stage}"
    s_rows = sorted(map(tuple, spark.sql(
        plan.sql(D.SPARK, job._view, sel, upto=stage)).collect()))
    con = duckdb.connect()
    pq = os.path.join(sf0001_dir, "docs_spans.parquet")
    con.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{pq}')")
    d_rows = sorted(con.execute(
        plan.sql(D.DUCKDB, "docs", sel, upto=stage)).fetchall())
    assert s_rows == d_rows


def test_index_applicability_pruning(job):
    """source d maps only email+tel (FIXTURES §3) → no name/dob/city
    attributes may be extracted from d-docs (SURVEY §3 row 15)."""
    bad = (job.attrs()
           .where((F.col("source") == "d")
                  & F.col("attr").isin("name", "dob", "city"))
           .count())
    assert bad == 0


def test_scope_include_resolvers(spark, docs_sf0001, model):
    """scope include/exclude (SURVEY §3 row 25): restricting to r_email only
    must produce clusters that never rely on name evidence — docs lacking an
    email stay singletons."""
    job = ResolutionJob(spark, docs_sf0001, model,
                        scope=Scope(include_resolvers=("r_email",)))
    edges = job.match_edges()
    assert edges.where(F.col("resolver") != "r_email").count() == 0


def test_model2_clusters_match_account_truth_exactly(spark, sf0001_dir):
    """the SECOND model (accounts: jw + ngram + dd/MM/yyyy window + number)
    also resolves its corpus to the truth partition exactly — all-pairs
    pairwise F1 = 1.0 (tp only) and partition equality, the
    ResolutionActionIT-parity evidence er2's oracle hashes imply but no
    test pinned directly."""
    from zentity_spark.model import Model
    docs = spark.read.parquet(
        os.path.join(sf0001_dir, "docs2_spans.parquet"))
    model = Model.parse(open(
        os.path.join(os.path.dirname(sf0001_dir),
                     "model_account.json")).read())
    c = ResolutionJob(spark, docs, model).clusters() \
        .select("doc_id", "entity_id")
    truth = spark.read.parquet(
        os.path.join(sf0001_dir, "docs2_truth.parquet")) \
        .select("doc_id", "account_id")
    rows = c.join(truth, "doc_id").collect()
    ent = {r["doc_id"]: r["entity_id"] for r in rows}
    acct = {r["doc_id"]: r["account_id"] for r in rows}
    ids = sorted(ent)
    tp = fp = fn = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            same_p, same_t = ent[a] == ent[b], acct[a] == acct[b]
            tp += same_p and same_t
            fp += same_p and not same_t
            fn += same_t and not same_p
    assert fp == 0 and fn == 0 and tp > 0, (tp, fp, fn)
