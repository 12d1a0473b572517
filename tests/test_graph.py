"""Connected-components + keep-first dedup (operators/graph.py)."""

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.graph import (
    connected_components,
    dedup_keep_first,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_components_chain_and_triangle(spark):
    """A 6-node chain (diameter 5 — forces multiple propagation
    rounds), a triangle, and an isolated edge resolve to min-id
    clusters; nodes in no pair are not emitted."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),      # chain
             (10, 11), (11, 12), (10, 12),                # triangle
             (20, 21)]                                    # lone edge
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    expect = {(n, 1) for n in range(1, 7)}
    expect |= {(n, 10) for n in (10, 11, 12)}
    expect |= {(20, 20), (21, 20)}
    assert got == expect


def test_components_iteration_cap_raises(spark):
    """A cap exit without convergence must RAISE (advisor r6): silent
    exit handed back wrong cluster ids for any component whose
    min-label distance exceeds the cap."""
    import pytest

    edges = [(i, i + 1) for i in range(1, 8)]
    with pytest.raises(RuntimeError, match="did not reach"):
        connected_components(_pairs(spark, edges), max_iterations=1)


def test_components_round_count_tracks_diameter(spark):
    """stats['iterations'] reports propagation rounds ≈ min-label
    diameter (+1 convergence-probe round): a 6-node chain needs a
    handful, a triangle converges immediately."""
    stats = {}
    connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]), stats=stats
    )
    assert stats["converged"] and 2 <= stats["iterations"] <= 6

    tri = {}
    connected_components(_pairs(spark, [(10, 11), (11, 12), (10, 12)]), stats=tri)
    assert tri["converged"] and tri["iterations"] == 1


def test_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (5, 6)]))
    kept = dedup_keep_first(docs, comp)
    assert {r.doc_id for r in kept.collect()} == {1, 4, 5}
