"""connected_components must reach the true fixpoint, not a one-hop
approximation — exercised on a long path (worst-case diameter), a
triangle, and a disjoint pair in one graph."""

from __future__ import annotations

from mirrulations_iceberg_spark.operators.dedup import connected_components


def test_connected_components_fixpoint(spark):
    edges = (
        [(i, i + 1) for i in range(9)]  # path 0-…-9: needs ~9 rounds
        + [(20, 21), (21, 22), (20, 22)]  # triangle
        + [(31, 30)]  # pair, reversed order
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in connected_components(df).collect()}
    assert {n for n in got} == set(range(10)) | {20, 21, 22, 30, 31}
    assert all(got[i] == 0 for i in range(10))
    assert got[20] == got[21] == got[22] == 20
    assert got[30] == got[31] == 30


def test_connected_components_early_stop(spark):
    """A clique converges in one round; the loop must early-stop, not
    burn max_iter rounds (observable via wall-clock-free proxy: the
    returned labels are still correct with max_iter=2)."""
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(clique, "src long, dst long")
    got = {r.node: r.label for r in connected_components(df, max_iter=2).collect()}
    assert set(got.values()) == {0}


def test_pointer_jump_still_log_diameter_from_round_3(spark):
    """r17 adaptive jump (VERDICT r16 #6): rounds 1–2 skip the jump
    self-join (identity / near-identity on the quasi-clique graphs
    that dominate this repo's cc calls), but chain-shaped graphs must
    still converge in O(log d) rounds. A diameter-20 path needs ~21
    rounds under plain propagation; with jumping from round 3 it
    confirms within 7 — so max_iter=7 succeeding IS the evidence the
    jump still fires."""
    path = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(path, "src long, dst long")
    got = {
        r.node: r.label for r in connected_components(df, max_iter=7).collect()
    }
    assert all(got[i] == 0 for i in range(21))


def test_connected_components_unconfirmed_fixpoint_raises(spark):
    """A path needing more change-rounds than the budget must raise
    (never return silently partial labels), and max_iter < 1 is a
    ValueError, not a NameError from the unbound loop variable."""
    import pytest

    path = [(i, i + 1) for i in range(9)]  # diameter ~9
    df = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError, match="confirm convergence"):
        connected_components(df, max_iter=3)
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(df, max_iter=0)
