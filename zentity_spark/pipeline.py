"""End-to-end resolution pipeline (the batch analog of
``POST _zentity/resolution/{entity_type}`` — SURVEY.md §4.1).

Stages (§3c): extract → blocking keys → composite candidate pairs → verified
match edges (all compiled SQL from plans/compiler.py, pure JVM codegen) →
connected components (operators/cluster.py) → cluster output with span
passthrough.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from zentity_spark import dialect as D
from zentity_spark.model import Model
from zentity_spark.operators.cluster import (
    bounded_label_propagation,
    connected_components,
)
from zentity_spark.plans.compiler import CompiledPlan, Scope, compile_model

# the fixture's default job scope: r_name_city_weak participates only in
# explicit scope tests (FIXTURES.md §3)
DEFAULT_SCOPE = Scope(exclude_resolvers=("r_name_city_weak",))


class ResolutionJob:
    """≙ ``resolution/Job.java`` (state + knobs, ≈L60-150) — but stateless
    between stages: every stage is a DataFrame the driver can materialize."""

    def __init__(self, spark: SparkSession, docs: DataFrame, model: Model,
                 scope: Scope | None = None, block_cap: int = 1000):
        self.spark = spark
        self.docs = docs
        self.plan: CompiledPlan = compile_model(
            model, scope or DEFAULT_SCOPE, block_cap)
        if any(m.kind == "jaro_winkler" for m in model.matchers.values()):
            from zentity_spark.functions.similarity import register_similarity_udfs
            register_similarity_udfs(spark)
        self._view = "docs_" + uuid.uuid4().hex[:12]
        docs.createOrReplaceTempView(self._view)

    def stage(self, select: str, upto: str | None = None) -> DataFrame:
        return self.spark.sql(
            self.plan.sql(D.SPARK, self._view, select, upto=upto))

    def attrs(self) -> DataFrame:
        return self.stage(
            "SELECT doc_id, source, attr, field, value_norm FROM attrs_x",
            upto="attrs_x")

    def keys(self) -> DataFrame:
        return self.stage("SELECT doc_id, attr, key FROM keys_x", upto="keys_x")

    def candidate_pairs(self) -> DataFrame:
        return self.stage(
            "SELECT doc_id_a, doc_id_b, resolver FROM pairs_x", upto="pairs_x")

    def match_edges(self) -> DataFrame:
        return self.stage(
            "SELECT doc_id_a, doc_id_b, resolver FROM match_edges_x",
            upto="match_edges_x")

    def explanations(self) -> DataFrame:
        """exploded match lineage (pair, resolver, attribute, matcher, s) —
        ≙ the `_explanation` matches array (SURVEY row 32)."""
        return self.stage(
            "SELECT doc_id_a, doc_id_b, resolver, attr, matcher, s "
            "FROM explain_x", upto="explain_x")

    def pair_scores(self) -> DataFrame:
        return self.stage(
            "SELECT doc_id_a, doc_id_b, score FROM pair_scores_x",
            upto="pair_scores_x")

    def doc_scores(self) -> DataFrame:
        return self.stage(
            "SELECT doc_id, score FROM doc_scores_x", upto="doc_scores_x")

    def explanation_structs(self) -> DataFrame:
        """per-doc nested explanation (≙ response `_explanation` payload,
        Job.java response assembly ≈L1200-1500): array of
        (resolver, attribute, matcher, other_doc, s) structs."""
        ex = self.explanations()
        both = ex.selectExpr(
            "doc_id_a AS doc_id", "doc_id_b AS other_doc",
            "resolver", "attr", "matcher", "s",
        ).unionByName(ex.selectExpr(
            "doc_id_b AS doc_id", "doc_id_a AS other_doc",
            "resolver", "attr", "matcher", "s"))
        return both.groupBy("doc_id").agg(
            F.sort_array(F.collect_list(F.struct(
                "resolver", "attr", "matcher", "other_doc", "s"
            ))).alias("explanation"))

    def clusters(self, edges: DataFrame | None = None) -> DataFrame:
        """(doc_id, entity_id, spans): every input doc labeled; docs in no
        component become singletons (entity_id = own doc_id); spans pass
        through untouched (per-row span-sequence invariant)."""
        if edges is None:
            edges = self.match_edges()
        labels = connected_components(edges.select("doc_id_a", "doc_id_b"))
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
        probe = build_probe(self.spark, self.plan, attributes, terms)
        extra = self.plan.seed_ctes(probe, D.SPARK)
        df = self.spark.sql(self.plan.sql(
            D.SPARK, self._view, "SELECT doc_id FROM seed_docs_x",
            extra=extra))
        # localCheckpoint: truncate the union-heavy seed plan NOW — letting
        # it flow into the label-propagation loop trips a Spark 4 constraint
        # rewrite bug (UnionBase.rewriteConstraints NoSuchElementException)
        return df.localCheckpoint()

    def resolve_input(self, attributes=None, terms=None, ids=None,
                      max_hops: int = 100,
                      edges: DataFrame | None = None) -> DataFrame:
        """full analog of ``POST _zentity/resolution/{type}`` input handling:
        seeds from attributes+terms (first-hop matching) and/or explicit
        ids, then bounded snowball → (doc_id, hop)."""
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
            edges.select("doc_id_a", "doc_id_b"), seeds, max_hops=max_hops)

    def resolve_seeded(self, seed_doc_ids, max_hops: int = 100,
                       edges: DataFrame | None = None) -> DataFrame:
        """seeded mode (≙ one reference resolution request): docs reachable
        from the seeds within max_hops, with _hop ordinals (SURVEY §8 M6)."""
        if edges is None:
            edges = self.match_edges()
        if isinstance(seed_doc_ids, (list, tuple)):
            seeds = self.spark.createDataFrame(
                [(s,) for s in seed_doc_ids], "doc_id string")
        else:
            seeds = seed_doc_ids
        return bounded_label_propagation(
            edges.select("doc_id_a", "doc_id_b"), seeds, max_hops=max_hops)


def resolve_all(spark: SparkSession, docs: DataFrame, model: Model,
                scope: Scope | None = None, block_cap: int = 1000) -> DataFrame:
    """convenience: full batch resolution → (doc_id, entity_id, spans)."""
    return ResolutionJob(spark, docs, model, scope, block_cap).clusters()
