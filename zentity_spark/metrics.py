"""Evaluation metrics: pairwise F1 on labeled pairs (the BASELINE gate)
and partition-quality counts against person ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pairwise_f1(clusters: DataFrame, labeled_pairs: DataFrame) -> dict:
    """clusters(doc_id, entity_id) × labeled_pairs(doc_id_a, doc_id_b,
    label) → {precision, recall, f1, tp, fp, fn} over the labeled pairs
    (BASELINE.md: F1 on labeled pairs at the same blocking key)."""
    ent = clusters.select("doc_id", "entity_id")
    j = (labeled_pairs
         .join(ent.withColumnRenamed("doc_id", "doc_id_a")
                  .withColumnRenamed("entity_id", "ent_a"), "doc_id_a")
         .join(ent.withColumnRenamed("doc_id", "doc_id_b")
                  .withColumnRenamed("entity_id", "ent_b"), "doc_id_b")
         .select("label", (F.col("ent_a") == F.col("ent_b")).alias("same")))
    agg = j.agg(
        F.sum(F.when((F.col("label") == 1) & F.col("same"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & F.col("same"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("label") == 1) & ~F.col("same"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn}


def partition_quality(clusters: DataFrame, truth: DataFrame) -> dict:
    """clusters × doc_truth(doc_id, person_id) → counts of split persons
    (one person across >1 entity) and merged entities (>1 person in one
    entity); both zero ⇔ the predicted partition equals the truth."""
    j = clusters.join(truth.select("doc_id", "person_id"), "doc_id")
    splits = (j.groupBy("person_id")
              .agg(F.countDistinct("entity_id").alias("n"))
              .where("n > 1").count())
    merges = (j.groupBy("entity_id")
              .agg(F.countDistinct("person_id").alias("n"))
              .where("n > 1").count())
    return {"split_persons": splits, "merged_entities": merges}
