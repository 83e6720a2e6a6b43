"""End-to-end resolution pipeline (the batch analog of
``POST _zentity/resolution/{entity_type}`` — SURVEY.md §4.1).

Stages (§3c): extract → blocking keys → composite candidate pairs → verified
match edges (all compiled SQL from plans/compiler.py, pure JVM codegen) →
connected components (operators/cluster.py) → cluster output with span
passthrough.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from zentity_spark import dialect as D
from zentity_spark.io import Storage
from zentity_spark.model import Model
from zentity_spark.operators.cluster import (
    bounded_label_propagation,
    connected_components_by_hash,
)
from zentity_spark.plans.compiler import CompiledPlan, Scope, compile_model

# the fixture's default job scope: r_name_city_weak participates only in
# explicit scope tests (FIXTURES.md §3)
DEFAULT_SCOPE = Scope(exclude_resolvers=("r_name_city_weak",))


class ResolutionJob:
    """≙ ``resolution/Job.java`` (state + knobs, ≈L60-150) — but stateless
    between stages: every stage is a DataFrame the driver can materialize."""

    def __init__(self, spark: SparkSession, docs: DataFrame, model: Model,
                 scope: Scope | None = None, block_cap: int = 1000,
                 checkpoint_dir: str | None = None,
                 storage: "Storage | None" = None,
                 wide_cc_ids: bool = False):
        self.spark = spark
        self.docs = docs
        # 128-bit CC node ids for 10¹²-doc deployments (labels identical
        # by test; ~2× CC shuffle width) — see connected_components_by_hash
        self.wide_cc_ids = wide_cc_ids
        self.storage = storage if storage is not None else Storage(spark)
        self._ckpt_dir = checkpoint_dir
        self._owns_ckpt_dir = checkpoint_dir is None
        self.plan: CompiledPlan = compile_model(
            model, scope or DEFAULT_SCOPE, block_cap)
        if any(m.kind == "jaro_winkler" for m in model.matchers.values()):
            from zentity_spark.functions.similarity import register_similarity_udfs
            register_similarity_udfs(spark)
        # an under-partitioned source (e.g. a single-row-group parquet)
        # would serialize the whole extract stage; one cheap shuffle up
        # front keeps every downstream stage at full parallelism
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if docs.rdd.getNumPartitions() < min(8, target):
            docs = docs.repartition(target)
            self.docs = docs
        self._view = "docs_" + uuid.uuid4().hex[:12]
        docs.createOrReplaceTempView(self._view)
        self._replace: dict = {}
        self._persisted: list = []

    def stage(self, select: str, upto: str | None = None,
              extra: list | None = None) -> DataFrame:
        # snapshot: materialize() worker threads mutate self._replace under
        # their lock; rendering must not iterate the live dict
        return self.spark.sql(
            self.plan.sql(D.SPARK, self._view, select, upto=upto,
                          extra=extra, replace=dict(self._replace)))

    # attrs first (everything derives from it), then keys and wide-vals as
    # CONCURRENT Spark jobs, then the per-resolver composite-key tables
    # (referenced 3× each by the skew-aware cap/pair plan: hot-key stats,
    # cold anti-join, hot semi-join — materializing avoids recomputing the
    # key joins per reference).  vals_x stays a CTE (only attributes_map
    # reads it — a separate materialization is a wasted barrier).
    def _base_levels(self):
        if os.environ.get("ZENTITY_MAT_ATTRS", "1") == "1":
            return (("attrs_x",), ("keys_x", "vals_wide_x"))
        # A/B: skip the attrs barrier — keys/vals_wide recompute the
        # (cheap) extract inline, one less sequential level
        return (("keys_x", "vals_wide_x"),)

    def _ck_level(self):
        # only resolvers whose pair plan keeps the skew machinery
        # reference their ck 3× (stats/anti/semi) and benefit from
        # materialization; skew-free resolvers reference ck once
        if os.environ.get("ZENTITY_MAT_CK", "1") != "1":
            return ()
        return tuple(f"ck_{r.name}"
                     for r in self.plan.active_resolvers()
                     if self.plan.resolver_needs_skew(r))

    def mat_stages(self):
        ck = self._ck_level()
        return self._base_levels() + ((ck,) if ck else ())

    def _compute_skew_policy(self) -> None:
        """fill plan.skew_policy from the materialized keys stage: ONE
        aggregate (max per-key block size per attribute) bounds every
        resolver's composite block size from above — min over the
        resolver's attributes, since a composite block shares every
        per-attribute key.  Resolvers whose bound stays at or under the
        hot threshold compile to plain self-joins (no window, no hot
        stats, no salting).  The collect is a ≤#attributes-row plan-time
        statistic, the same adaptive-planning category as AQE's runtime
        stats."""
        if self.plan.skew_policy is not None:
            return
        rows = self.stage(
            "SELECT attr, max(c) AS mx FROM ("
            "SELECT attr, key, count(*) AS c FROM keys_x "
            "GROUP BY attr, key) GROUP BY attr",
            upto="keys_x").collect()
        mx = {r["attr"]: r["mx"] for r in rows}
        thr = self.plan.hot_threshold
        self.plan.skew_policy = {
            r.name: min((mx.get(a, 0) for a in r.attributes), default=0) > thr
            for r in self.plan.active_resolvers()}

    def materialize(self, stages=None) -> None:
        """write the fan-out stages to parquet once and substitute file
        scans for their CTEs (idempotent); independent stages within one
        dependency level run as concurrent Spark jobs from threads.

        Two reasons files, not cached temp views: (1) Spark recomputes CTE
        subtrees per reference, so attrs/keys would re-run once per
        resolver branch; (2) cached-view re-references inside the
        self-joining chain trip Spark 4 attribute-resolution bugs
        (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND), while a parquet relation is
        a clean leaf.  At cluster scale this is exactly the per-stage
        materialization the resume/lineage design wants (SURVEY §5.3).
        """
        import threading
        import time as _t
        if stages is None:
            # base stages first; the keys statistics then decide which
            # resolvers keep the skew machinery (and need ck materialized)
            self.materialize(self._base_levels())
            self._compute_skew_policy()
            ck = self._ck_level()
            if ck:
                self.materialize((ck,))
            return
        # ZENTITY_MAT=ckpt: materialize via localCheckpoint + temp views
        # (in-memory partitions, no parquet encode/decode round-trip).
        # Off by default: parquet is the resumable/lineage path, and temp
        # views are per-session state.  Used by bench.py for the
        # fixed-cost A/B (BENCH/BASELINE.md round-2 notes).
        if os.environ.get("ZENTITY_MAT", "parquet") == "ckpt":
            for level in stages:
                todo = [st for st in level if st not in self._replace]
                dfs = [(st, self.stage(f"SELECT * FROM {st}", upto=st))
                       for st in todo]
                for st, df in dfs:
                    view = f"{self._view}_{st}"
                    df.localCheckpoint().createOrReplaceTempView(view)
                    self._replace[st] = view
            return
        if self._ckpt_dir is None:
            # same safe-scratch base as spark.local.dir (session.py): the
            # sandbox /tmp sweeper that killed blockmgr dirs would equally
            # eat stage parquet mid-read on a long run
            base = os.environ.get(
                "ZENTITY_LOCAL_DIR", os.path.expanduser("~/.zentity_spark_local"))
            os.makedirs(base, exist_ok=True)
            self._ckpt_dir = tempfile.mkdtemp(prefix="zentity_stage_", dir=base)
            self._owns_ckpt_dir = True
        os.makedirs(self._ckpt_dir, exist_ok=True)
        self._check_fingerprint()

        for level in stages:
            todo = [st for st in level if st not in self._replace]
            # pre-render every stage's SQL BEFORE starting threads: worker
            # threads must not call stage() (which reads self._replace)
            # while the level's fast-path updates land
            jobs = []
            for st in todo:
                path = os.path.join(self._ckpt_dir, st)
                if not self.storage.complete(path):
                    jobs.append((st, path,
                                 self.stage(f"SELECT * FROM {st}", upto=st)))

            def run_one(st: str, path: str, df: DataFrame) -> None:
                from pyspark.sql import Observation
                t0 = _t.time()
                # Observation: row count piggybacks on the write job — no
                # post-write re-read pass for lineage metrics
                obs = Observation()
                self.storage.write(
                    df.observe(obs, F.count(F.lit(1)).alias("n")), path)
                self._metric(st, obs.get["n"], (_t.time() - t0) * 1000)

            if len(jobs) == 1:
                run_one(*jobs[0])
            elif jobs:
                threads = [threading.Thread(target=run_one, args=j)
                           for j in jobs]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
            for st in todo:
                path = os.path.join(self._ckpt_dir, st)
                self._replace[st] = self.storage.scan_sql(path)

    def cache_stages_under(self, base: str) -> "ResolutionJob":
        """share materialized stages across jobs: the checkpoint dir becomes
        ``base/<fingerprint>``, so any job with the same (model, scope,
        block_cap, input files) reuses already-written stage parquet
        (idempotent via per-stage _SUCCESS markers) instead of re-deriving
        it into a fresh mkdtemp.  The dir is NOT owned (never auto-deleted
        by unpersist) — callers manage ``base``'s lifetime."""
        os.makedirs(base, exist_ok=True)
        self._ckpt_dir = os.path.join(base, self.fingerprint())
        self._owns_ckpt_dir = False
        return self

    def unpersist(self) -> None:
        """drop stage substitutions and remove the job-owned scratch dir
        (user-supplied checkpoint dirs are never deleted)."""
        self._replace.clear()
        if self._owns_ckpt_dir and self._ckpt_dir is not None:
            import shutil
            shutil.rmtree(self._ckpt_dir, ignore_errors=True)
            self._ckpt_dir = None

    def fingerprint(self) -> str:
        """identity of (model, scope, block_cap, input files): a checkpoint
        dir written under one fingerprint must not be resumed under another
        — stale stage parquet would silently join against new docs."""
        import hashlib
        files = ";".join(sorted(self.docs.inputFiles()))
        body = "|".join([
            self.plan.model.to_json(), repr(self.plan.scope),
            str(self.plan.block_cap), files,
            # id-width mode changes cluster labels' collision identity:
            # a narrow-mode checkpoint must not serve a wide-mode resume
            f"wide_cc={self.wide_cc_ids}"])
        return hashlib.md5(body.encode()).hexdigest()

    def _check_fingerprint(self) -> None:
        fp_path = os.path.join(self._ckpt_dir, "fingerprint.txt")
        fp = self.fingerprint()
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                prev = f.read().strip()
            if prev != fp:
                raise ValueError(
                    f"checkpoint dir {self._ckpt_dir} was written for a "
                    f"different (model, scope, block_cap, docs) — refusing "
                    f"to resume (stale fingerprint {prev[:12]}…, current "
                    f"{fp[:12]}…). Use a fresh --checkpoint-dir.")
        else:
            with open(fp_path, "w") as f:
                f.write(fp)

    # ---------- checkpointed execution (SURVEY §5.3 resume/lineage, M7) ----------

    def _metric(self, stage: str, rows: int, wall_ms: float) -> None:
        import json
        import time as _t
        with open(os.path.join(self._ckpt_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({
                "stage": stage, "rows_out": rows,
                "wall_ms": round(wall_ms, 1), "ts": _t.time()}) + "\n")

    def _ckpt_stage(self, name: str, build) -> DataFrame:
        """idempotent stage materialization: skip when the stage's parquet
        is complete (_SUCCESS), else compute, write, and record lineage.
        The restart contract: overwrite-by-stage, so a killed run resumes
        from the last completed stage with identical results."""
        import time as _t
        from pyspark.sql import Observation
        path = os.path.join(self._ckpt_dir, name)
        if not self.storage.complete(path):
            t0 = _t.time()
            obs = Observation()
            self.storage.write(
                build().observe(obs, F.count(F.lit(1)).alias("n")), path)
            self._metric(name, obs.get["n"], (_t.time() - t0) * 1000)
        return self.storage.read(path)

    def run_checkpointed(self) -> DataFrame:
        """full batch resolution with EVERY major stage materialized to
        ``checkpoint_dir`` + a ``metrics.jsonl`` lineage log — the batch
        analog of a resumable job (the reference's jobs are in-heap and
        not resumable, SURVEY §5.2; this is our deliberate strengthening).
        """
        if self._ckpt_dir is None:
            raise ValueError("run_checkpointed requires checkpoint_dir")
        os.makedirs(self._ckpt_dir, exist_ok=True)
        self.materialize()              # attrs_x / keys_x / vals_x
        edges = self._ckpt_stage("edges", self.match_edges)
        labels = self._ckpt_stage(
            "clusters",
            lambda: self.clusters(edges).select("doc_id", "entity_id"))
        return (
            self.docs.join(labels, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("entity_id", "doc_id").alias("entity_id"),
                    "spans")
        )

    def attrs(self) -> DataFrame:
        return self.stage(
            "SELECT doc_id, source, attr, field, value_norm FROM attrs_x",
            upto="attrs_x")

    def keys(self) -> DataFrame:
        return self.stage("SELECT doc_id, attr, key FROM keys_x", upto="keys_x")

    def candidate_pairs(self) -> DataFrame:
        self.materialize()
        return self.stage(
            "SELECT doc_id_a, doc_id_b, resolver FROM pairs_x", upto="pairs_x")

    def match_edges(self) -> DataFrame:
        self.materialize()
        return self.stage(
            "SELECT doc_id_a, doc_id_b, resolver FROM match_edges_x",
            upto="match_edges_x")

    def explanations(self) -> DataFrame:
        """exploded match lineage (pair, resolver, attribute, matcher,
        s_a, s_b) — ≙ the `_explanation` matches array (SURVEY row 32);
        s_a/s_b are the identity scores with each side's own source's
        declared field quality (per-index granularity)."""
        self.materialize()
        return self.stage(
            "SELECT doc_id_a, doc_id_b, resolver, attr, field, matcher, "
            "s_a, s_b FROM explain_x", upto="explain_x")

    def pair_scores(self) -> DataFrame:
        self.materialize()
        return self.stage(
            "SELECT doc_id_a, doc_id_b, score FROM pair_scores_x",
            upto="pair_scores_x")

    def doc_scores(self) -> DataFrame:
        self.materialize()
        return self.stage(
            "SELECT doc_id, score FROM doc_scores_x", upto="doc_scores_x")

    def explanation_structs(self, doc_ids: DataFrame | None = None) -> DataFrame:
        """per-doc nested explanation (≙ response `_explanation` payload,
        Job.java response assembly ≈L1200-1500): array of
        (resolver, attribute, field, matcher, other_doc, s) structs.
        ``doc_ids`` restricts aggregation to the hit set."""
        ex = self.explanations()
        both = ex.selectExpr(
            "doc_id_a AS doc_id", "doc_id_b AS other_doc",
            "resolver", "attr", "field", "matcher", "s_a AS s",
        ).unionByName(ex.selectExpr(
            "doc_id_b AS doc_id", "doc_id_a AS other_doc",
            "resolver", "attr", "field", "matcher", "s_b AS s"))
        if doc_ids is not None:
            both = both.join(F.broadcast(doc_ids.select("doc_id")),
                             "doc_id", "semi")
        return both.groupBy("doc_id").agg(
            F.sort_array(F.collect_list(F.struct(
                "resolver", "attr", "field", "matcher", "other_doc", "s"
            ))).alias("explanation"))

    def clusters(self, edges: DataFrame | None = None) -> DataFrame:
        """(doc_id, entity_id, spans): every input doc labeled; docs in no
        component become singletons (entity_id = own doc_id); spans pass
        through untouched (per-row span-sequence invariant)."""
        if edges is None:
            # checkpoint: connected_components_by_hash consumes the edge
            # relation twice (hashed CC input + the nodes/label-restore
            # join) — without this the whole pairs+verify plan executes
            # twice per resolution (the dominant avoidable cost in the
            # round-2 fixed-cost fit, BENCH/BASELINE.md)
            edges = self.match_edges() \
                .select("doc_id_a", "doc_id_b").localCheckpoint()
        labels = connected_components_by_hash(
            edges.select("doc_id_a", "doc_id_b"),
            wide_ids=self.wide_cc_ids)
        return (
            self.docs.join(labels, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("entity_id", "doc_id").alias("entity_id"),
                "spans",
            )
        )

    def seed_docs(self, attributes=None, terms=None) -> DataFrame:
        """docs matched by the FIRST hop of a reference resolution request
        with these input attributes/terms (SURVEY rows 13/24)."""
        from zentity_spark.input import build_probe
        probe, in_params = build_probe(self.spark, self.plan, attributes, terms)
        extra = self.plan.seed_ctes(probe, D.SPARK, input_params=in_params)
        # materialized-stage substitution keeps the rendered plan small —
        # without it the full keys/vals derivation SQL inlines per CTE
        # reference and Catalyst analysis dominates the seeded query
        self.materialize()
        df = self.spark.sql(self.plan.sql(
            D.SPARK, self._view, "SELECT doc_id FROM seed_docs_x",
            extra=extra, replace=dict(self._replace)))
        # localCheckpoint: truncate the union-heavy seed plan NOW — letting
        # it flow into the label-propagation loop trips a Spark 4 constraint
        # rewrite bug (UnionBase.rewriteConstraints NoSuchElementException)
        return df.localCheckpoint()

    def _edges_q(self, edges: DataFrame) -> DataFrame:
        """attach the per-resolver query ordinal (≙ the `_query` ordinal the
        reference records per hit — our hop's "queries" are the per-resolver
        edge streams, ordered by resolver name)."""
        names = sorted(r.name for r in self.plan.active_resolvers())
        branches = " ".join(
            f"WHEN resolver = '{n}' THEN {i}" for i, n in enumerate(names))
        return edges.select(
            "doc_id_a", "doc_id_b",
            F.expr(f"CASE {branches} ELSE 0 END").alias("q"))

    def resolve_input(self, attributes=None, terms=None, ids=None,
                      max_hops: int = 100,
                      max_time_per_query: float | None = None,
                      edges: DataFrame | None = None) -> DataFrame:
        """full analog of ``POST _zentity/resolution/{type}`` input handling:
        seeds from attributes+terms (first-hop matching) and/or explicit
        ids, then bounded snowball → (doc_id, hop, q)."""
        seeds = None
        if attributes or terms:
            seeds = self.seed_docs(attributes, terms)
        if ids:
            ids_df = self.spark.createDataFrame(
                [(s,) for s in ids], "doc_id string")
            seeds = ids_df if seeds is None else seeds.union(ids_df).distinct()
        if seeds is None:
            raise ValueError("resolution input needs attributes, terms or ids")
        if edges is None:
            edges = self.match_edges()
        return bounded_label_propagation(
            self._edges_q(edges), seeds, max_hops=max_hops,
            max_time_s=max_time_per_query)

    def attributes_map(self, doc_ids: DataFrame | None = None) -> DataFrame:
        """(doc_id, attributes map<attr, array<value>>) — the harvested
        attribute set per doc (≙ `_attributes` hit payload, row 33).
        ``doc_ids`` (broadcast) restricts aggregation to the hit set —
        a seeded request must not pay a corpus-wide groupBy."""
        vals = self.stage("SELECT doc_id, attr, vlist FROM vals_x",
                          upto="vals_x")
        if doc_ids is not None:
            vals = vals.join(F.broadcast(doc_ids.select("doc_id")),
                             "doc_id", "semi")
        return (vals.groupBy("doc_id")
                .agg(F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("attr", "vlist")))
                ).alias("attributes")))

    def doc_scores_for(self, doc_ids: DataFrame) -> DataFrame:
        """doc scores aggregated over the hit set only (semi-join BEFORE the
        pivot/groupBy — the full-corpus ``doc_scores()`` stays for the batch
        mode)."""
        ex = self.explanations()
        both = ex.selectExpr("doc_id_a AS doc_id", "attr", "s_a AS s").unionByName(
            ex.selectExpr("doc_id_b AS doc_id", "attr", "s_b AS s"))
        both = both.join(F.broadcast(doc_ids.select("doc_id")),
                         "doc_id", "semi")
        attrs = self.plan.scored_attrs()
        pivots = [F.max(F.when(F.col("attr") == a, F.col("s"))).alias(f"s_{i}")
                  for i, a in enumerate(attrs)]
        conf = self.plan._conflation([f"s_{i}" for i in range(len(attrs))])
        return (both.groupBy("doc_id").agg(*pivots)
                .selectExpr("doc_id", f"{conf} AS score"))

    def response(self, attributes=None, terms=None, ids=None,
                 max_hops: int = 100, max_time_per_query: float | None = None,
                 include_attributes: bool = True,
                 include_score: bool = True, include_explanation: bool = False,
                 include_source: bool = True) -> DataFrame:
        """assembled resolution response for one input — the batch analog of
        the REST hit payload (`Job.java::run` response block ≈L1200-1500,
        SURVEY rows 5/31/33): (doc_id, hop, q [, attributes][, score]
        [, explanation][, spans]).

        Every auxiliary payload aggregates over the HIT SET only (broadcast
        semi-joins before the groupBys) — a seeded request never pays a
        corpus-wide aggregation (round-1 ADVICE/VERDICT fix)."""
        edges = self.match_edges()
        hits = self.resolve_input(attributes=attributes, terms=terms,
                                  ids=ids, max_hops=max_hops,
                                  max_time_per_query=max_time_per_query,
                                  edges=edges).localCheckpoint()
        ids_df = hits.select("doc_id")
        out = hits.select("doc_id", F.col("hop").cast("int").alias("hop"),
                          F.col("q").cast("int").alias("q"))
        if include_attributes:
            out = out.join(self.attributes_map(ids_df), "doc_id", "left")
        if include_score:
            out = out.join(self.doc_scores_for(ids_df), "doc_id", "left")
        if include_explanation:
            out = out.join(self.explanation_structs(ids_df), "doc_id", "left")
        if include_source:
            out = out.join(self.docs.select("doc_id", "spans"), "doc_id",
                           "left")
        return out

    def resolve_seeded(self, seed_doc_ids, max_hops: int = 100,
                       edges: DataFrame | None = None) -> DataFrame:
        """seeded mode (≙ one reference resolution request): docs reachable
        from the seeds within max_hops, with _hop/_query ordinals
        (SURVEY §8 M6)."""
        if edges is None:
            edges = self.match_edges()
        if isinstance(seed_doc_ids, (list, tuple)):
            seeds = self.spark.createDataFrame(
                [(s,) for s in seed_doc_ids], "doc_id string")
        else:
            seeds = seed_doc_ids
        return bounded_label_propagation(
            self._edges_q(edges), seeds, max_hops=max_hops)


def resolve_all(spark: SparkSession, docs: DataFrame, model: Model,
                scope: Scope | None = None, block_cap: int = 1000) -> DataFrame:
    """convenience: full batch resolution → (doc_id, entity_id, spans)."""
    return ResolutionJob(spark, docs, model, scope, block_cap).clusters()
