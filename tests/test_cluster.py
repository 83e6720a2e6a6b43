"""Connected-components & bounded label propagation vs a pure-Python
union-find oracle (SURVEY.md §6.2 item 5): random graphs via hypothesis,
plus hand-built hop-semantics cases (max_hops parity, SURVEY §8 R2).
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from zentity_spark.operators.cluster import (
    bounded_label_propagation,
    connected_components,
)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for i in range(n_nodes):
        comps.setdefault(find(i), set()).add(i)
    return {frozenset(f"n{j:03d}" for j in c) for c in comps.values() if len(c) > 1}


def _spark_components(spark, edges):
    df = spark.createDataFrame(
        [(f"n{a:03d}", f"n{b:03d}") for a, b in edges],
        "doc_id_a string, doc_id_b string")
    labels = connected_components(df)
    comps = {}
    for r in labels.collect():
        comps.setdefault(r["entity_id"], set()).add(r["doc_id"])
    return {frozenset(c) for c in comps.values()}


edges_strategy = st.lists(
    st.tuples(st.integers(0, 29), st.integers(0, 29)),
    min_size=1, max_size=60)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_cc_matches_union_find(spark, edges):
    expect = _uf_components(30, edges)
    got = _spark_components(spark, [e for e in edges if e[0] != e[1]])
    # CC omits isolated nodes; oracle omits singletons — compare multi-node sets
    assert got == expect


def test_cc_empty(spark):
    df = spark.createDataFrame([], "doc_id_a string, doc_id_b string")
    assert connected_components(df).count() == 0


def test_cc_label_is_component_min(spark):
    df = spark.createDataFrame(
        [("c", "b"), ("b", "a"), ("z", "y")],
        "doc_id_a string, doc_id_b string")
    rows = {r["doc_id"]: r["entity_id"]
            for r in connected_components(df).collect()}
    assert rows == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}


def test_cc_long_chain(spark):
    # path graph of 40 nodes → single component, exercises multiple
    # large/small-star rounds (O(log n) convergence)
    edges = [(i, i + 1) for i in range(39)]
    got = _spark_components(spark, edges)
    assert got == {frozenset(f"n{i:03d}" for i in range(40))}


def test_bounded_label_propagation_hops(spark):
    # chain d1-d2-d3-d4 plus isolated d9 (scenario S4 shape, FIXTURES §6)
    edges = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d3", "d4")],
        "doc_id_a string, doc_id_b string")
    seeds = spark.createDataFrame([("d1",)], "doc_id string")

    full = {r["doc_id"]: r["hop"] for r in
            bounded_label_propagation(edges, seeds, max_hops=10).collect()}
    assert full == {"d1": 0, "d2": 1, "d3": 2, "d4": 3}

    one = {r["doc_id"]: r["hop"] for r in
           bounded_label_propagation(edges, seeds, max_hops=1).collect()}
    assert one == {"d1": 0, "d2": 1}


def test_bounded_label_propagation_zero_hops(spark):
    edges = spark.createDataFrame(
        [("d1", "d2")], "doc_id_a string, doc_id_b string")
    seeds = spark.createDataFrame([("d1",)], "doc_id string")
    got = {r["doc_id"]: r["hop"] for r in
           bounded_label_propagation(edges, seeds, max_hops=0).collect()}
    assert got == {"d1": 0}


def test_cc_wide_ids_identical_labels(spark):
    """128-bit node-id mode (VERDICT r4 missing #4): the struct-of-two-
    hashes ids flow through the same star rounds and restore EXACTLY the
    labels of the 64-bit mode on the fixture corpus's match edges."""
    from zentity_spark.model import Model
    from zentity_spark.operators.cluster import connected_components_by_hash
    from zentity_spark.pipeline import ResolutionJob

    docs = spark.read.parquet("fixtures/sf0.001/docs_spans.parquet")
    model = Model.parse(open("fixtures/model_person.json").read())
    edges = (ResolutionJob(spark, docs, model).match_edges()
             .select("doc_id_a", "doc_id_b").localCheckpoint())
    narrow = {(r["doc_id"], r["entity_id"]) for r in
              connected_components_by_hash(edges).collect()}
    wide = {(r["doc_id"], r["entity_id"]) for r in
            connected_components_by_hash(edges, wide_ids=True).collect()}
    assert narrow == wide and len(narrow) > 0
    # and through the job-level flag: full clusters() output identical
    base = ResolutionJob(spark, docs, model).clusters() \
        .select("doc_id", "entity_id").collect()
    w = ResolutionJob(spark, docs, model, wide_cc_ids=True).clusters() \
        .select("doc_id", "entity_id").collect()
    assert {tuple(r) for r in base} == {tuple(r) for r in w}


def test_cc_wide_ids_salt_first_independence(spark):
    """regression guard for the 128-bit mode's independence property:
    Spark's multi-arg xxhash64 chains the running hash as the next seed,
    so xxhash64(c, 1) is a PURE FUNCTION of xxhash64(c) (an h1 collision
    would force an h2 collision — zero added resistance).  The shipped
    form must salt FIRST (xxhash64(1, c)); pin that h2 differs from the
    chained form, and that h2 is not reconstructable from h1 alone by
    the chain rule."""
    rows = spark.sql(
        "SELECT xxhash64('a') h1, xxhash64(1, 'a') salted, "
        "xxhash64('a', 1) chained").collect()[0]
    assert rows["salted"] != rows["chained"]
    from zentity_spark.operators.cluster import connected_components_by_hash
    import inspect
    src = inspect.getsource(connected_components_by_hash)
    assert "xxhash64(1, {c})" in src and "xxhash64({c}, 1)" not in src
