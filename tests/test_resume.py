"""Resume/lineage (BASELINE.md resumability row): a checkpointed run
writes per-stage parquet + metrics; killing after stage k and re-running
reproduces identical clusters while skipping completed stages.
"""

import json
import os
import shutil

import pytest

from zentity_spark.pipeline import ResolutionJob


@pytest.fixture
def ckpt(tmp_path):
    return str(tmp_path / "ckpt")


def _labels(df):
    return sorted((r["doc_id"], r["entity_id"])
                  for r in df.select("doc_id", "entity_id").collect())


def test_checkpointed_matches_direct(spark, docs_sf0001, model, ckpt):
    job = ResolutionJob(spark, docs_sf0001, model, checkpoint_dir=ckpt)
    got = _labels(job.run_checkpointed())
    direct = _labels(ResolutionJob(spark, docs_sf0001, model).clusters())
    assert got == direct


def test_resume_skips_completed_stages(spark, docs_sf0001, model, ckpt):
    job = ResolutionJob(spark, docs_sf0001, model, checkpoint_dir=ckpt)
    first = _labels(job.run_checkpointed())

    # "kill after edges": drop the final stage output, keep the rest
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    attrs_mtime = os.path.getmtime(os.path.join(ckpt, "attrs_x", "_SUCCESS"))
    edges_mtime = os.path.getmtime(os.path.join(ckpt, "edges", "_SUCCESS"))

    job2 = ResolutionJob(spark, docs_sf0001, model, checkpoint_dir=ckpt)
    second = _labels(job2.run_checkpointed())
    assert second == first
    # completed stages untouched (skipped, not recomputed)
    assert os.path.getmtime(
        os.path.join(ckpt, "attrs_x", "_SUCCESS")) == attrs_mtime
    assert os.path.getmtime(
        os.path.join(ckpt, "edges", "_SUCCESS")) == edges_mtime


def test_metrics_lineage_written(spark, docs_sf0001, model, ckpt):
    job = ResolutionJob(spark, docs_sf0001, model, checkpoint_dir=ckpt)
    job.run_checkpointed()
    with open(os.path.join(ckpt, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    stages = [r["stage"] for r in rows]
    # keys_x / vals_wide_x materialize concurrently → order varies;
    # ck_* stages appear only when the skew policy keeps a resolver's
    # cap/salt machinery (the fixture corpus is provably under-threshold)
    assert {"attrs_x", "keys_x", "vals_wide_x",
            "edges", "clusters"} <= set(stages)
    assert stages[0] == "attrs_x" and stages[-1] == "clusters"
    assert all(r["rows_out"] > 0 and r["wall_ms"] > 0 for r in rows)


def test_stale_checkpoint_refused(spark, docs_sf0001, model, ckpt):
    """reusing a checkpoint dir after the job identity changes (model /
    scope / block_cap / input files) must refuse, not silently join stale
    stage parquet against the new inputs (ADVICE round 1)."""
    job = ResolutionJob(spark, docs_sf0001, model, checkpoint_dir=ckpt)
    job.run_checkpointed()
    job2 = ResolutionJob(spark, docs_sf0001, model, checkpoint_dir=ckpt,
                         block_cap=7)
    with pytest.raises(ValueError, match="fingerprint"):
        job2.run_checkpointed()


def test_unpersist_removes_owned_scratch_dir(spark, docs_sf0001, model):
    """jobs without a checkpoint_dir own their scratch dir and must remove
    it on unpersist (bench loops were leaking stage parquet into /tmp)."""
    job = ResolutionJob(spark, docs_sf0001, model)
    job.materialize()
    scratch = job._ckpt_dir
    assert scratch is not None and os.path.exists(scratch)
    job.unpersist()
    assert not os.path.exists(scratch)


def test_unpersist_keeps_user_checkpoint_dir(spark, docs_sf0001, model, ckpt):
    job = ResolutionJob(spark, docs_sf0001, model, checkpoint_dir=ckpt)
    job.run_checkpointed()
    job.unpersist()
    assert os.path.exists(os.path.join(ckpt, "clusters"))


def test_fingerprint_covers_wide_cc_ids(spark):
    """a checkpoint written under one CC id-width must not serve a resume
    under the other: the flag is part of the job fingerprint."""
    from zentity_spark.model import Model
    from zentity_spark.pipeline import ResolutionJob
    docs = spark.read.parquet("fixtures/sf0.001/docs_spans.parquet")
    model = Model.parse(open("fixtures/model_person.json").read())
    narrow = ResolutionJob(spark, docs, model).fingerprint()
    wide = ResolutionJob(spark, docs, model,
                         wide_cc_ids=True).fingerprint()
    assert narrow != wide
