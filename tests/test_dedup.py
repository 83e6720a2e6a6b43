"""Incremental dedup fold: fold(Δ1); fold(Δ2) == batch near-dup pairs
over the union (same pairs, same jaccards, same groups), replayed folds
converge, and the Δ probe broadcasts when small."""

import os

import pytest
from pyspark.sql import functions as F

from zentity_spark import dialect as D, tdops
from zentity_spark.operators.cluster import connected_components
from zentity_spark.operators.dedup import IncrementalDeduper

BASE = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango")
NEAR = BASE.replace("india", "indigo")
OTHER = ("zulu yankee xray whiskey victor uniform umbra sigma quart "
         "unique words entirely different order permuted randomly here now")

DOCS = [
    (1, BASE), (2, BASE),            # exact dups
    (3, NEAR),                       # near-dup of 1/2
    (4, OTHER),                      # unrelated
    (5, OTHER + " coda"),            # near-dup of 4, later fold
    (6, "tiny doc"),                 # < w tokens: no shingles, singleton
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_pairs(spark, rows):
    _df(spark, rows).createOrReplaceTempView("_dedup_batch")
    return {(r[0], r[1]): r[2] for r in spark.sql(
        tdops.sql_minhash_lowbg_pairs("_dedup_batch", D.SPARK)).collect()}


def test_fold_equals_batch(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    p1 = d.fold(_df(spark, DOCS[:3]))
    p2 = d.fold(_df(spark, DOCS[3:]))
    got = {(r[0], r[1]): r[2] for r in d.pairs().collect()}
    want = _batch_pairs(spark, DOCS)
    assert got == want and len(want) >= 3          # (1,2) (1,3) (2,3) (4,5)
    # each pair surfaces exactly once, at the fold of its later member
    f1 = {(r[0], r[1]) for r in p1.collect()}
    f2 = {(r[0], r[1]) for r in p2.collect()}
    assert f1 | f2 == set(want) and not (f1 & f2)
    assert (4, 5) in f2
    # groups == CC over the batch pairs, singletons included
    groups = {r[0]: r[1] for r in d.groups().collect()}
    edges = spark.createDataFrame(
        [(a, b) for a, b in want], "doc_id_a long, doc_id_b long")
    lab = {r[0]: r[1] for r in connected_components(edges).collect()}
    assert groups == {i: lab.get(i, i) for i, _ in DOCS}
    assert groups[6] == 6 and groups[2] == 1


def test_replayed_fold_converges(spark, tmp_path):
    state = str(tmp_path / "state")
    d = IncrementalDeduper(spark, state)
    d.fold(_df(spark, DOCS[:3]))
    d.fold(_df(spark, DOCS[3:]))
    # simulate a crash BEFORE fold 1's commit: its inc=1 dirs exist but
    # the pointer still says fold 0 — streaming would retry the batch
    import json
    with open(os.path.join(state, "CURRENT"), "w") as f:
        json.dump({"fold_id": 0}, f)
    # replay the same increment: overwrite of inc=1, identical state
    d2 = IncrementalDeduper(spark, state)
    assert d2.committed_fold_id() == 0
    d2.fold(_df(spark, DOCS[3:]))
    got = {(r[0], r[1]): r[2] for r in d2.pairs().collect()}
    assert got == _batch_pairs(spark, DOCS)
    n = d2.pairs().count()
    assert n == len(got)                            # no duplicate rows


def test_stream_dedup_folds_backlog(spark, tmp_path):
    """two landing files drained with availableNow == the batch keep-one
    map (the dedup twin of test_stream_resolve_folds_backlog)."""
    from zentity_spark.streaming.dedup_stream import stream_dedup
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate((DOCS[:3], DOCS[3:])):
        _df(spark, rows).write.parquet(os.path.join(landing, f"drop{i}"))
    q, deduper = stream_dedup(
        spark, os.path.join(landing, "*"), str(tmp_path / "state"),
        str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(120)
    got = {(r[0], r[1]): r[2] for r in deduper.pairs().collect()}
    assert got == _batch_pairs(spark, DOCS)
    groups = {r[0]: r[1] for r in deduper.groups().collect()}
    assert groups[2] == 1 and groups[6] == 6 and len(groups) == len(DOCS)


def test_small_delta_probe_broadcasts(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    d.fold(_df(spark, DOCS[:3]))
    d.fold(_df(spark, DOCS[3:]))
    assert "Broadcast" in d.last_probe_plan


def test_ratio_gated_compaction(spark, tmp_path):
    """VERDICT r4 wrong #4: with a low ratio, accumulated deltas trigger a
    compacting fold that rewrites every stage into ONE inc dir, drops the
    older dirs, and preserves fold == batch exactly (pairs, groups, and
    the once-per-pair discovery contract)."""
    state = str(tmp_path / "state")
    d = IncrementalDeduper(spark, state, auto_compact_ratio=0.5)
    # (returned pair DFs are read eagerly: a later compacting fold drops
    # the inc dirs a lazy reader would still reference)
    f1 = {(r[0], r[1]) for r in d.fold(_df(spark, DOCS[:3])).collect()}
    assert d.last_fold_compacted             # bootstrap: trivial compaction
    f2 = {(r[0], r[1]) for r in d.fold(_df(spark, DOCS[3:4])).collect()}
    assert not d.last_fold_compacted         # delta 1 <= 0.5*3
    f3 = {(r[0], r[1]) for r in d.fold(_df(spark, DOCS[4:])).collect()}
    assert d.last_fold_compacted             # delta 3 > 1.5: compacts
    # every stage pruned to the single compacted inc dir
    for stage in ("docs", "sh", "bands", "pairs"):
        incs = [x for x in os.listdir(os.path.join(state, stage))
                if x.startswith("inc=")]
        assert incs == ["inc=2"], (stage, incs)
    # fold == batch still holds through the compaction
    got = {(r[0], r[1]): r[2] for r in d.pairs().collect()}
    want = _batch_pairs(spark, DOCS)
    assert got == want
    assert f1 | f2 | f3 == set(want)
    assert not (f1 & f3) and not (f2 & f3) and not (f1 & f2)
    assert (4, 5) in f3                      # discovered AT the compacting fold
    groups = {r[0]: r[1] for r in d.groups().collect()}
    assert groups[2] == 1 and groups[5] == 4 and groups[6] == 6
    # a post-compaction fold reads the compacted base and stays correct
    more = [(7, OTHER + " coda")]            # near-dup of 4/5
    p4 = d.fold(_df(spark, more))
    got = {(r[0], r[1]): r[2] for r in d.pairs().collect()}
    assert got == _batch_pairs(spark, DOCS + more)
    assert {(r[0], r[1]) for r in p4.collect()} == {(4, 7), (5, 7)}


def test_replayed_compacting_fold_converges(spark, tmp_path, monkeypatch):
    """a compacting fold that crashes BEFORE its pointer rename (the only
    replayable window — after the rename the fold is committed and the
    caller skips it) leaves its full-view inc dirs written, the pointer at
    the previous fold, and the older dirs intact; the replay overwrites
    its own dirs and converges to the identical state."""
    from zentity_spark.operators import dedup as dd
    state = str(tmp_path / "state")
    d = IncrementalDeduper(spark, state, auto_compact_ratio=0.5)
    d.fold(_df(spark, DOCS[:3]))
    real_replace = os.replace

    def crash(src, dst):
        raise OSError("simulated crash before pointer rename")

    monkeypatch.setattr(dd.os, "replace", crash)
    with pytest.raises(OSError):
        d.fold(_df(spark, DOCS[3:]))         # compacts (delta 3 > 1.5)
    monkeypatch.setattr(dd.os, "replace", real_replace)
    d2 = IncrementalDeduper(spark, state, auto_compact_ratio=0.5)
    assert d2.committed_fold_id() == 0       # pointer never moved
    d2.fold(_df(spark, DOCS[3:]))            # replay converges
    assert d2.last_fold_compacted
    got = {(r[0], r[1]): r[2] for r in d2.pairs().collect()}
    assert got == _batch_pairs(spark, DOCS)
    assert d2.pairs().count() == len(got)    # no duplicate rows
    for stage in ("docs", "sh", "bands", "pairs"):
        incs = [x for x in os.listdir(os.path.join(state, stage))
                if x.startswith("inc=")]
        assert incs == ["inc=1"], (stage, incs)


def test_replay_of_committed_fold_is_noop(spark, tmp_path):
    """an at-least-once caller replaying a fold that already COMMITTED
    (pointer moved) must not rewrite state: after a compacting fold, a
    delta-only rewrite of the compacted inc would silently drop every
    pre-compaction row from all reads."""
    state = str(tmp_path / "state")
    d = IncrementalDeduper(spark, state, auto_compact_ratio=0.5)
    d.fold(_df(spark, DOCS[:3]))
    d.fold(_df(spark, DOCS[3:]))             # compacts (delta 3 > 1.5)
    assert d.last_fold_compacted
    before = {(r[0], r[1]): r[2] for r in d.pairs().collect()}
    # replay BOTH committed folds explicitly
    d.fold(_df(spark, DOCS[:3]), fold_id=0)
    d.fold(_df(spark, DOCS[3:]), fold_id=1)
    after = {(r[0], r[1]): r[2] for r in d.pairs().collect()}
    assert after == before == _batch_pairs(spark, DOCS)
    assert d.committed_fold_id() == 1


def test_legacy_state_without_accounting_still_compacts(spark, tmp_path):
    """a pre-accounting CURRENT ({'fold_id': i} only, base_rows absent)
    must not disable compaction forever: the next fold compacts
    immediately, bootstrapping the accounting."""
    import json
    state = str(tmp_path / "state")
    d = IncrementalDeduper(spark, state, auto_compact_ratio=4.0)
    d.fold(_df(spark, DOCS[:3]))
    with open(os.path.join(state, "CURRENT"), "w") as f:
        json.dump({"fold_id": 0}, f)         # legacy pointer shape
    d2 = IncrementalDeduper(spark, state, auto_compact_ratio=4.0)
    d2.fold(_df(spark, DOCS[3:]))
    assert d2.last_fold_compacted
    cur = json.load(open(os.path.join(state, "CURRENT")))
    assert cur["base_inc"] == 1 and cur["base_rows"] == len(DOCS)
    got = {(r[0], r[1]): r[2] for r in d2.pairs().collect()}
    assert got == _batch_pairs(spark, DOCS)
