"""connected_components contracts (operators/dedup.py): label-propagation
correctness on a hand-built graph, plus cluster invariants on real near-dup
pairs. The oracle-parity test cross-checks the full query against a DuckDB
recursive CTE."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.dedup import (
    connected_components,
    ngram_jaccard_pairs,
)
from european_emissions_data_warehouse_spark.sources.readers import load_table


def test_toy_graph_components(spark):
    # path 1-2-3 (needs >1 propagation round), triangle 20-21-22, pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)], ["id_a", "id_b"]
    )
    got = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_long_path_needs_many_rounds(spark):
    # a 12-node path: min label must flood end to end
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)], ["id_a", "id_b"])
    comps = connected_components(pairs)
    assert comps.select("component").distinct().collect() == [(0,)]


def test_pair_endpoints_share_component(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, k=5, unit="word", threshold=0.4)
    comps = connected_components(pairs)
    a = comps.withColumnRenamed("id", "id_a").withColumnRenamed("component", "comp_a")
    b = comps.withColumnRenamed("id", "id_b").withColumnRenamed("component", "comp_b")
    split_edges = (
        pairs.join(a, "id_a").join(b, "id_b").filter(F.col("comp_a") != F.col("comp_b")).count()
    )
    assert split_edges == 0
    # component id is the min member id
    bad_min = (
        comps.groupBy("component")
        .agg(F.min("id").alias("min_id"))
        .filter(F.col("component") != F.col("min_id"))
        .count()
    )
    assert bad_min == 0


def test_star_matches_min_label_on_random_graphs(spark):
    """large-star/small-star must produce the identical (id, component)
    labeling as min-label propagation — checked on seeded random graphs
    with many components, long paths, and dense blobs."""
    import random

    from european_emissions_data_warehouse_spark.operators.dedup import (
        connected_components_star,
    )

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        # self-loops stay IN: both implementations must label a node that
        # appears only in (x, x) pairs (code-review r4 — star derived its
        # node universe from the self-loop-filtered edge set and dropped
        # such nodes, and this test previously filtered them out too)
        # plus a path long enough to stress diameter handling (min-label
        # needs diameter rounds — keep under its cap; star needs O(log n))
        edges += [(200 + i, 201 + i) for i in range(18)]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        ml = {(r.id, r.component) for r in connected_components(pairs).collect()}
        st = {(r.id, r.component) for r in connected_components_star(pairs).collect()}
        assert st == ml, f"seed={seed}: star != min-label"


def test_star_converges_past_min_label_diameter_limit(spark):
    """The point of the star rewrites: a 40-node path exceeds min-label's
    25-round cap (one hop flooded per round) but star-contraction halves
    the diameter each round and finishes in O(log n)."""
    from european_emissions_data_warehouse_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], ["id_a", "id_b"])
    comps = connected_components_star(pairs)
    assert comps.select("component").distinct().collect() == [(0,)]
    assert comps.count() == 41


def test_star_toy_graph(spark):
    from european_emissions_data_warehouse_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)], ["id_a", "id_b"]
    )
    got = {(r.id, r.component) for r in connected_components_star(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_star_labels_self_loop_only_nodes(spark):
    """A node appearing only as (x, x) — an id pairing with itself after
    normalization — must still receive a label, matching
    connected_components (code-review r4: star silently dropped it)."""
    from european_emissions_data_warehouse_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame([(5, 5), (1, 2)], ["id_a", "id_b"])
    ml = {(r.id, r.component) for r in connected_components(pairs).collect()}
    st = {(r.id, r.component) for r in connected_components_star(pairs).collect()}
    assert st == ml == {(1, 1), (2, 1), (5, 5)}
