"""Session hygiene of the iterative operators (VERDICT r2 wrong #1-2):

  * ``connected_components`` must not mutate the caller session's conf —
    its loop-local partition sizing / AQE toggle live in a dedicated child
    session, so concurrent jobs on the shared session keep their plans;
  * ``bounded_label_propagation`` must broadcast a small frontier into the
    hop join (BroadcastHashJoin in the hop plan, no per-hop edge shuffle).
"""

import threading
import time

from pyspark.sql import functions as F

from zentity_spark.operators import cluster
from zentity_spark.operators.cluster import (
    bounded_label_propagation,
    connected_components,
)


def _chain_edges(spark, n=4000):
    return spark.range(n - 1).select(
        F.format_string("n-%07d", "id").alias("doc_id_a"),
        F.format_string("n-%07d", F.col("id") + 1).alias("doc_id_b"))


def test_cc_does_not_mutate_session_conf(spark):
    """poll the shared session's conf from a concurrent thread for the
    whole duration of a CC run — it must never change."""
    keys = ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    before = {k: spark.conf.get(k) for k in keys}
    seen = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            seen.append({k: spark.conf.get(k) for k in keys})
            time.sleep(0.02)

    t = threading.Thread(target=poll)
    t.start()
    try:
        labels = connected_components(_chain_edges(spark))
        assert labels.count() == 4000
    finally:
        stop.set()
        t.join()
    assert seen, "poller never sampled"
    assert all(s == before for s in seen), \
        f"session conf mutated during CC: {[s for s in seen if s != before][:3]}"
    assert {k: spark.conf.get(k) for k in keys} == before


def test_cc_result_composes_with_caller_session(spark):
    """the labels DataFrame must join cleanly with caller-session frames."""
    labels = connected_components(_chain_edges(spark, 50))
    docs = spark.range(50).select(
        F.format_string("n-%07d", "id").alias("doc_id"))
    joined = docs.join(labels, "doc_id", "left")
    assert joined.count() == 50
    assert joined.where(F.col("entity_id") == "n-0000000").count() == 50


def test_lp_broadcasts_small_frontier(spark):
    """every hop of a seeded propagation with a tiny frontier runs as a
    broadcast join of the frontier against the checkpointed edge list."""
    edges = _chain_edges(spark, 64)
    seeds = spark.createDataFrame([("n-0000000",)], "doc_id string")
    cluster._LAST_HOP_PLANS.clear()
    cluster._PLAN_AUDIT = True
    try:
        out = bounded_label_propagation(edges, seeds, max_hops=3)
        assert out.count() == 4  # seed + 3 hops down the chain
    finally:
        cluster._PLAN_AUDIT = False
    plans = cluster._LAST_HOP_PLANS
    assert plans, "no hop plans captured"
    for p in plans:
        assert "BroadcastHashJoin" in p, f"hop not broadcast:\n{p[:2000]}"
