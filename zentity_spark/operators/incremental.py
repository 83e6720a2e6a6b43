"""Incremental entity resolution: fold document increments into an
existing resolution WITHOUT recomputing old×old candidate pairs.

The reference resolves per REQUEST (``resolution/Job.java`` hop loop) and
has no batch-increment notion; at 10^12-doc scale a corpus can never
re-resolve from scratch on every arrival, so this is the additive scale
path the streaming ingest module (streaming/ingest.py) was designed to
feed.  Correctness contract (tested in tests/test_incremental.py):

    bootstrap(D); add(Δ1); …; add(Δk)   ==   batch resolve(D ∪ Δ1 ∪ … ∪ Δk)

exactly (same labels), provided no composite block exceeds ``block_cap``
— the per-block cap trims blocks in doc_id order over whatever corpus the
job sees, so a capped hot block may admit different survivors
incrementally than in one batch (the cap is an approximation in the
reference too: ``max_docs_per_query``).

Why increments are cheap:
  * every pre-pair stage (attrs/keys/vals/vals_wide/composite keys) is
    PER-DOCUMENT — stage(D ∪ Δ) = stage(D) ∪ stage(Δ) — so the state dir
    just appends the Δ rows to each stage's parquet;
  * Δ candidate pairs probe the combined key table with only the new
    docs' composite keys (compiler.sql_pairs_delta), broadcast when the
    increment is small: no shuffle of the old keys, no old×old join;
  * verification reuses the compiled match_edges plan with ``pairs_x``
    redirected at the Δ pair relation;
  * only components TOUCHED by a Δ edge re-cluster: old labels restricted
    to touched entities re-enter connected components as star edges
    (label forest ≡ old connectivity), untouched labels pass through
    byte-identical.

State layout under ``state_dir``:
    docs/inc=<fold_id>/   ingested documents, ONE subdir per increment
    attrs_x/ keys_x/ vals_x/ vals_wide_x/ ck_<resolver>/  (same inc= layout)
                   per-doc stage rows per increment
    edges/inc=<fold_id>/  verified match edges (full edge log ⇒ the
                   labels can always be rebuilt from scratch)
    labels/inc=<fold_id>/ ONLY the components relabeled by that fold
                   (bootstrap writes the full label set); the current
                   label of a doc is its row at the HIGHEST committed
                   inc — latest-writer-wins per doc_id
    CURRENT        json pointer {"fold_id": i, "n_batches": k,
                                 "base_rows": b, "delta_rows": d}

Every state table is delta-partitioned, so a fold WRITES O(Δ + touched
components), never O(N) — the labels/seen-ids full rewrite that used to
dominate fold cost at large N (BENCH/incremental_bench.json r4) is gone.
Docs not yet visible in any committed label inc (``inc > CURRENT.fold_id``)
ARE the next fold's Δ, which both removes the separate seen-id table and
self-heals increments orphaned by a crash.  Read amplification is bounded
by ratio-gated compaction (``auto_compact_ratio``): when the cumulative
delta rows exceed the ratio × the last compacted base, the commit writes
the full current view instead of the delta and drops older incs —
amortized O(1) extra write per label row, LSM-style.

Exactly-once folds (ADVICE r3 medium): every per-increment write goes to a
deterministic ``inc=<fold_id>`` subdirectory in OVERWRITE mode, so a
replayed fold (Structured Streaming retries a micro-batch after a
mid-fold crash, with the same batch_id and the same rows) replaces its
own partial output instead of appending duplicates; labels written at an
uncommitted inc are invisible to readers (the view filters
``inc <= CURRENT.fold_id``), and CURRENT commits via atomic rename.  A
fold that already committed is skipped entirely by the caller via
``committed_fold_id()`` (streaming/resolve.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from zentity_spark import dialect as D
from zentity_spark.io import Storage
from zentity_spark.model import Model
from zentity_spark.operators.cluster import (_id_stats, broadcast_row_budget,
                                             connected_components_by_hash)
from zentity_spark.pipeline import DEFAULT_SCOPE, ResolutionJob
from zentity_spark.plans.compiler import Scope

# per-document stages whose union across increments equals the batch stage
PER_DOC_STAGES = ("attrs_x", "keys_x", "vals_x", "vals_wide_x")

# conservative per-row id-width estimate for byte-gating the delta-label
# broadcast in labels() (doc_id strings are ~8-16 bytes in the fixture
# corpora; real ids are rarely wider than this allowance)
_LABEL_ID_BYTES = 32.0



class IncrementalResolver:
    """Stateful incremental resolution over a model (SURVEY §3 operators,
    re-expressed as a fold).  Not thread-safe; one writer per state_dir."""

    def __init__(self, spark: SparkSession, model: Model, state_dir: str,
                 scope: Scope | None = None, block_cap: int = 1000,
                 storage: Storage | None = None,
                 auto_compact_ratio: float = 4.0,
                 wide_cc_ids: bool = False):
        self.spark = spark
        self.storage = storage if storage is not None else Storage(spark)
        self.model = model
        self.scope = scope if scope is not None else DEFAULT_SCOPE
        self.block_cap = block_cap
        # 128-bit CC node ids — the incremental fold IS the 10¹²-doc
        # operating mode, so the collision-margin flag must be reachable
        # here, not only on the batch job (see connected_components_by_hash)
        self.wide_cc_ids = wide_cc_ids
        # compact the labels table when cumulative delta rows exceed
        # ratio × the last compacted base (None/0 disables auto-compaction)
        self.auto_compact_ratio = auto_compact_ratio
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self._ptr = os.path.join(state_dir, "CURRENT")
        # observability for tests/operators: executed plan of the last Δ
        # pair job (asserts the broadcast), last Δ edge count
        self.last_pairs_plan: str | None = None
        self.last_delta_edges: int = 0

    # ---------- state helpers ----------

    def _path(self, stage: str) -> str:
        return os.path.join(self.state_dir, stage)

    def _part(self, stage: str, fold_id: int) -> str:
        """per-increment overwrite target: replayed folds replace their own
        partial output (partition-dir layout, so reading the stage root
        sees the union of all increments plus an ``inc`` column)."""
        return os.path.join(self._path(stage), f"inc={fold_id}")

    def committed_fold_id(self) -> int:
        """fold_id of the last COMMITTED increment (-1 before the first) —
        the skip gate for replayed stream micro-batches."""
        cur = self._current()
        return cur.get("fold_id", -1) if cur else -1

    def _scan(self, stage: str) -> str:
        return self.storage.scan_sql(self._path(stage))

    def _current(self) -> dict | None:
        if not os.path.exists(self._ptr):
            return None
        with open(self._ptr) as f:
            return json.load(f)

    def _ck_stages(self, job: ResolutionJob) -> list:
        return [f"ck_{r.name}" for r in job.plan.active_resolvers()]

    def docs(self) -> DataFrame:
        return self.storage.read(self._path("docs")).select("doc_id", "spans")

    def labels(self) -> DataFrame:
        """current (doc_id, entity_id) for edge-bearing docs (singletons are
        implicit, as in ResolutionJob.clusters).  The table is
        delta-partitioned by fold: a doc's live label is its row at the
        highest COMMITTED inc (relabeled components re-emit every member,
        so latest-writer-wins per doc_id is exact), and rows at
        uncommitted incs — a fold that crashed before its CURRENT rename —
        are filtered out."""
        cur = self._current()
        if cur is None:
            raise ValueError("no increments folded yet")
        # The latest-wins view never needs to shuffle all N rows:
        #   * no deltas since the last compaction (bootstrap included) ⇒
        #     the base inc IS the view — plain scan, no shuffle (measured
        #     ~O(N) fold overhead at sf1 before this fast path);
        #   * small deltas (cumulative delta_rows under the session's own
        #     broadcast budget) ⇒ aggregate ONLY the delta incs, then
        #     base ANTI-JOIN broadcast(delta doc_ids) ∪ deltas — the base
        #     streams through unshuffled, so the steady-state fold between
        #     compactions stays O(Δ)-shuffle;
        #   * otherwise (deltas near the compaction threshold, catalog
        #     formats, or a pre-base_inc state file) fall back to the
        #     full latest-wins aggregate.
        # Stale dirs below base_inc (a crashed compaction cleanup) are
        # skipped entirely: the compacted inc holds the full view.
        root = self._path("labels")
        base_inc = cur.get("base_inc")
        if (self.storage.file_based and base_inc is not None
                and os.path.isdir(root)):
            incs = [int(d.split("=")[1]) for d in os.listdir(root)
                    if d.startswith("inc=")
                    and int(d.split("=")[1]) <= cur["fold_id"]]
            if base_inc in incs:
                base = (self.storage.read(
                            os.path.join(root, f"inc={base_inc}"))
                        .select("doc_id", "entity_id"))
                if not any(i > base_inc for i in incs):
                    return base
                d_rows = cur.get("delta_rows") or 0
                if 0 < d_rows <= broadcast_row_budget(
                        self.spark, _LABEL_ID_BYTES):
                    deltas = (self.storage.read(root)
                              .where((F.col("inc") > base_inc)
                                     & (F.col("inc") <= cur["fold_id"])))
                    d_latest = (deltas.groupBy("doc_id")
                                .agg(F.max_by("entity_id", "inc")
                                     .alias("entity_id")))
                    return (base.join(
                                F.broadcast(d_latest.select("doc_id")),
                                "doc_id", "left_anti")
                            .unionByName(d_latest))
        lab = (self.storage.read(root)
               .where(F.col("inc") <= cur["fold_id"]))
        return (lab.groupBy("doc_id")
                .agg(F.max_by("entity_id", "inc").alias("entity_id")))

    def clusters(self) -> DataFrame:
        """(doc_id, entity_id, spans) for every ingested doc — singletons
        labeled by their own doc_id; spans pass through untouched."""
        docs = self.docs()
        return (docs.join(self.labels(), "doc_id", "left")
                .select("doc_id",
                        F.coalesce("entity_id", "doc_id").alias("entity_id"),
                        "spans"))

    # ---------- the fold ----------

    def add(self, new_docs: DataFrame, fold_id: int | None = None) -> DataFrame:
        """fold one increment; returns the updated labels DataFrame.

        Contract: doc_ids globally unique across increments (the streaming
        ingest dedups on doc_id before the sink).  ``fold_id`` identifies
        the increment for replay idempotency — a stream passes its
        micro-batch id (stable across retries); direct callers default to
        the next batch ordinal."""
        spark = self.spark
        cur = self._current()
        committed = self.committed_fold_id()
        if fold_id is None:
            # strictly above every committed fold — stream batch_ids can
            # skip ordinals (empty batches), so n_batches+1 could collide
            # with (and overwrite) an existing inc= dir
            fold_id = committed + 1
        elif fold_id <= committed:
            raise ValueError(
                f"fold_id {fold_id} already committed (last = {committed}) "
                f"— replaying a committed fold would overwrite its state")
        new_docs = new_docs.select("doc_id", "spans")
        self.storage.write(new_docs, self._part("docs", fold_id))
        # re-read from the state table: one scan source for every
        # downstream use (and the input plan may be a one-shot stream batch)
        if cur is None:
            return self._bootstrap(self.docs(), fold_id)
        return self._fold_delta(fold_id)

    def _write_stage_rows(self, job: ResolutionJob, fold_id: int) -> None:
        """write the increment's per-doc stage rows + composite keys into
        the state dirs (job is over the Δ docs ONLY; its stages ARE the
        Δ rows of the combined stages); overwrite-per-increment for
        replay idempotency."""
        job.materialize()  # Δ-local: attrs/keys/vals_wide (+ ck if skewed)
        for st in PER_DOC_STAGES:
            self.storage.write(
                job.stage(f"SELECT * FROM {st}", upto=st),
                self._part(st, fold_id))
        for st in self._ck_stages(job):
            self.storage.write(
                job.stage(f"SELECT doc_id, ckey FROM {st}", upto=st),
                self._part(st, fold_id))

    def _bootstrap(self, docs: DataFrame, fold_id: int) -> DataFrame:
        """first increment = the full batch path (keeps the batch plan's
        skew salting for the one genuinely large job), stages persisted
        into the state dirs for later increments to union against."""
        job = ResolutionJob(self.spark, docs, self.model, self.scope,
                            self.block_cap)
        self._write_stage_rows(job, fold_id)
        edges = job.match_edges()
        self.storage.write(edges, self._part("edges", fold_id))
        job.unpersist()
        edges = self.storage.read(self._path("edges"))
        labels = connected_components_by_hash(
            edges.select("doc_id_a", "doc_id_b"),
            wide_ids=self.wide_cc_ids)
        return self._commit(labels, fold_id, compact=True)

    def _fold_delta(self, fold_id: int) -> DataFrame:
        spark = self.spark
        cur = self._current()
        docs_all = self.docs()
        # Δ = every doc landed SINCE the last committed fold: the docs
        # table is inc-partitioned, so ``inc > committed`` is exactly the
        # set no committed label state has seen — the current increment
        # plus any increment a crashed fold orphaned (self-healing; the
        # old seen-id table tracked the same set with an O(N) rewrite per
        # fold).  doc_ids are globally unique across increments (streaming
        # ingest dedups on doc_id before the sink).
        new_docs = (self.storage.read(self._path("docs"))
                    .where(F.col("inc") > cur["fold_id"])
                    .select("doc_id", "spans"))

        # 1. Δ per-doc stage rows appended
        dj = ResolutionJob(spark, new_docs, self.model, self.scope,
                           self.block_cap)
        self._write_stage_rows(dj, fold_id)
        dj.unpersist()

        # 2. combined-corpus job with every per-doc stage redirected at the
        # state parquet — nothing per-doc recomputes for old docs
        job = ResolutionJob(spark, docs_all, self.model, self.scope,
                            self.block_cap)
        for st in PER_DOC_STAGES + tuple(self._ck_stages(job)):
            job._replace[st] = self._scan(st)
        job._compute_skew_policy()

        # 3. Δ candidate pairs: probe combined keys with the new ids only.
        # The Δ-side broadcast is BYTE-gated against the session's own
        # autoBroadcastJoinThreshold (rows × measured id width — ADVICE r3:
        # a fixed 1M-row cap hinted wide-id relations past the planner's
        # size check); a too-large Δ falls back to a shuffle join.
        n_new, id_w = _id_stats(new_docs)
        v_new = f"{job._view}_newids"
        new_docs.select("doc_id").createOrReplaceTempView(v_new)
        bcast = n_new <= broadcast_row_budget(spark, id_w)
        plan = job.plan
        delta_select = " UNION ALL ".join(
            plan.sql_pairs_delta(r, D.SPARK, v_new, broadcast_new=bcast)
            for r in plan.active_resolvers())
        pairs = spark.sql(plan.sql(
            D.SPARK, job._view, delta_select,
            upto=plan.last_key_cte(D.SPARK), replace=dict(job._replace)))
        v_pairs = f"{job._view}_dpairs"
        pairs.localCheckpoint().createOrReplaceTempView(v_pairs)
        self.last_pairs_plan = \
            pairs._jdf.queryExecution().executedPlan().toString()
        job._replace["pairs_x"] = v_pairs

        # 4. verify ONLY the Δ pairs through the compiled edge plan
        d_edges = job.stage(
            "SELECT doc_id_a, doc_id_b, resolver FROM match_edges_x",
            upto="match_edges_x")
        self.storage.write(d_edges, self._part("edges", fold_id))
        d_edges = d_edges.localCheckpoint()
        self.last_delta_edges = d_edges.count()

        # 5. merge: re-cluster touched components only.  The fold COMMITS
        # only the relabeled components (every member of a touched
        # component re-appears in the CC output, star edges ≡ old
        # connectivity); untouched labels survive at their older incs —
        # no O(N) label rewrite.
        old = self.labels().localCheckpoint()
        d_nodes = (d_edges.select(F.col("doc_id_a").alias("doc_id"))
                   .union(d_edges.select("doc_id_b")).distinct())
        touched = (old.join(F.broadcast(d_nodes), "doc_id", "semi")
                   .select("entity_id").distinct().localCheckpoint())
        star = (old.join(F.broadcast(touched), "entity_id", "semi")
                .where(F.col("doc_id") != F.col("entity_id"))
                .select(F.col("doc_id").alias("doc_id_a"),
                        F.col("entity_id").alias("doc_id_b")))
        relabeled = connected_components_by_hash(
            star.union(d_edges.select("doc_id_a", "doc_id_b")),
            wide_ids=self.wide_cc_ids)
        job.unpersist()
        return self._commit(relabeled, fold_id)

    def _commit(self, delta_labels: DataFrame, fold_id: int,
                compact: bool = False) -> DataFrame:
        """commit one fold's label delta at ``labels/inc=<fold_id>``.

        Deterministic under replay: the delta is a pure function of the
        committed state + the increment's rows, and the partition write is
        an overwrite — a crashed-then-replayed fold converges to the same
        bytes.  Compaction (bootstrap, or when the cumulative deltas
        exceed ``auto_compact_ratio`` × the compacted base) folds the full
        current view into THIS inc and drops the older incs after the
        pointer rename — a crash between rename and removal leaves only
        rows that the latest-wins view already supersedes."""
        cur = self._current()
        n = (cur["n_batches"] + 1) if cur else 1
        delta_labels = delta_labels.select("doc_id",
                                           "entity_id").localCheckpoint()
        d_rows = delta_labels.count()
        base_rows = cur.get("base_rows", 0) if cur else 0
        delta_rows = (cur.get("delta_rows", 0) if cur else 0) + d_rows
        ratio = self.auto_compact_ratio or 0
        if cur and ratio and base_rows and delta_rows > ratio * base_rows:
            compact = True
        drop_incs: list[str] = []
        if compact:
            if cur:  # full view = older committed incs ⊕ this delta
                older = (self.labels()
                         .join(delta_labels, "doc_id", "left_anti"))
                delta_labels = older.unionByName(delta_labels)
                root = self._path("labels")
                if self.storage.file_based:
                    drop_incs = [os.path.join(root, d)
                                 for d in os.listdir(root)
                                 if d.startswith("inc=")
                                 and int(d.split("=")[1]) != fold_id]
                # catalog formats: superseded rows are harmless (the
                # latest-wins view ignores them); snapshot expiry is the
                # catalog's job
            base_rows, delta_rows = None, 0  # recount below
        self.storage.write(delta_labels, self._part("labels", fold_id))
        if base_rows is None:
            base_rows = self.storage.read(
                self._part("labels", fold_id)).count()
        # base_inc = the inc holding the last compacted FULL view; read
        # paths use it to serve base + small-delta reads without an O(N)
        # aggregate, and to ignore stale pre-compaction dirs a crashed
        # cleanup may have left behind
        base_inc = fold_id if compact else (
            cur.get("base_inc") if cur else None)
        tmp = self._ptr + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fold_id": fold_id, "n_batches": n,
                       "base_rows": base_rows, "delta_rows": delta_rows,
                       "base_inc": base_inc}, f)
        os.replace(tmp, self._ptr)
        for p in drop_incs:
            self.storage.remove(p)
        return self.labels()
