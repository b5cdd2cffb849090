"""Triangle counting: correctness on a crafted graph and the
degree-ordered orientation's bounded wedge work (VERDICT r4 item 8)."""

from __future__ import annotations


def test_triangle_count_on_hub_graph(spark):
    """Star hub 0—{1..20} plus rim edges (1,2) and (3,4): exactly two
    triangles. Under id-ordering the low-id hub would generate
    C(20,2)=190 wedges; degree-ordering orients every star edge INTO
    the hub, so only the two closing wedges are examined — the property
    that keeps wedge work O(m^1.5) on heavy-tailed near-dup graphs."""
    from tfl_bikes_data_pipeline_spark.operators.graph import triangle_count

    edges = [(0, i) for i in range(1, 21)] + [(1, 2), (3, 4)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    row = triangle_count(pairs).first()
    assert row.n_triangles == 2
    assert row.n_edges == 22
    # degree-ordered wedge work: one wedge per rim edge, not C(hub_deg, 2)
    assert row.n_wedges == 2


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    """Cross-check the wedge-join census against an all-triples brute
    force on a deterministic pseudo-random graph (including duplicate
    and reversed input pairs, which must collapse in the edge dedup)."""
    from itertools import combinations

    from tfl_bikes_data_pipeline_spark.operators.graph import triangle_count

    n = 30
    edges = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if (a * 31 + b * 17) % 7 == 0
    ]
    eset = set(edges)
    expected = sum(
        1
        for a, b, c in combinations(range(n), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    noisy = edges + [(b, a) for a, b in edges[::3]] + edges[::5]
    pairs = spark.createDataFrame(noisy, "doc_a long, doc_b long")
    row = triangle_count(pairs).first()
    assert row.n_triangles == expected
    assert row.n_edges == len(edges)


def test_id_ordering_same_triangles_more_hub_wedges(spark):
    """The id-ordered A/B variant (tools/triangle_crossover.py) must
    count the SAME triangles; on the low-id hub graph it examines all
    C(20,2)=190 hub wedges (the two closing ones included) where the
    degree ordering examines exactly 2 — the unboundedness the declared
    plan's degree ordering buys out."""
    from tfl_bikes_data_pipeline_spark.operators.graph import triangle_count

    edges = [(0, i) for i in range(1, 21)] + [(1, 2), (3, 4)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    by_id = triangle_count(pairs, ordering="id").first()
    assert by_id.n_triangles == 2
    assert by_id.n_edges == 22
    assert by_id.n_wedges == 190
