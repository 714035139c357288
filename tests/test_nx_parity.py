"""Independent-oracle parity: graph operators vs NetworkX.

The reference's graph core IS NetworkX (reference osm/graph.py), so nx
is the natural independent oracle for components/degree semantics —
available in this container even though GeoPandas/Shapely are not.
"""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from osm_chordify_spark.operators import graph as GR


@pytest.fixture(scope="module")
def random_multigraph():
    rng = np.random.default_rng(42)
    n_nodes, n_edges = 300, 420
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    # sprinkle parallel edges and self-loops
    u = np.concatenate([u, u[:20], [5, 6]])
    v = np.concatenate([v, v[:20], [5, 6]])
    keys = []
    seen: dict = {}
    for a, b in zip(u, v):
        k = seen.get((a, b), 0)
        keys.append(k)
        seen[(a, b)] = k + 1
    return pd.DataFrame({"u": u.astype(int), "v": v.astype(int), "key": keys})


def test_components_match_networkx(spark, random_multigraph):
    g = nx.Graph()
    g.add_edges_from(random_multigraph[["u", "v"]].itertuples(index=False))
    nx_comps = {}
    for comp in nx.connected_components(g):
        label = min(comp)
        for node in comp:
            nx_comps[node] = label
    pairs = spark.createDataFrame(
        random_multigraph.rename(columns={"u": "src", "v": "dst"})[["src", "dst"]]
    )
    mine = (
        GR.connected_components(pairs)
        .toPandas()
        .set_index("id")["component"]
        .to_dict()
    )
    # nodes with only self-loops are excluded from ours; compare the rest
    for node, label in mine.items():
        assert nx_comps[node] == label, node
    nx_nontrivial = {n for n, lbl in nx_comps.items() if any(
        m != n for m in nx.node_connected_component(g, n)
    )}
    assert set(mine.keys()) == nx_nontrivial


def test_largest_component_matches_networkx(spark, random_multigraph):
    g = nx.Graph()
    g.add_edges_from(random_multigraph[["u", "v"]].itertuples(index=False))
    giant = max(nx.connected_components(g), key=len)
    nodes = spark.createDataFrame(
        pd.DataFrame(
            {
                "node_id": sorted(set(random_multigraph.u) | set(random_multigraph.v)),
            }
        ).assign(x=0.0, y=0.0)
    )
    edges = spark.createDataFrame(random_multigraph)
    kn, ke = GR.largest_component(nodes, edges)
    mine = set(kn.toPandas()["node_id"])
    # our CC ignores pure self-loop nodes; the giant component of a
    # 420-edge/300-node graph has none of those edge cases
    assert mine == set(giant)
    ke_p = ke.toPandas()
    assert set(ke_p["u"]) <= mine


@pytest.mark.parametrize("max_local_arcs", [1_000_000, 0])
def test_strong_components_match_networkx(spark, random_multigraph, max_local_arcs):
    """Both SCC paths — driver Tarjan (small-graph dispatch) and the
    distributed Orzan coloring (max_local_arcs=0) — match NetworkX."""
    g = nx.DiGraph()
    g.add_edges_from(random_multigraph[["u", "v"]].itertuples(index=False))
    nx_scc = {}
    for comp in nx.strongly_connected_components(g):
        label = min(comp)
        for node in comp:
            nx_scc[node] = label
    pairs = spark.createDataFrame(
        random_multigraph.rename(columns={"u": "src", "v": "dst"})[["src", "dst"]]
    )
    mine = (
        GR.strongly_connected_components(pairs, max_local_arcs=max_local_arcs)
        .toPandas()
        .set_index("id")["component"]
        .to_dict()
    )
    assert mine == nx_scc


def test_strong_components_oneway_cycle_plus_chain(spark):
    # cycle 0→1→2→3→0 is one SCC; appended oneway chain 3→10→11 is
    # singletons — the case where weak and strong genuinely differ
    pdf = pd.DataFrame(
        {"src": [0, 1, 2, 3, 3, 10], "dst": [1, 2, 3, 0, 10, 11]}
    )
    out = (
        GR.strongly_connected_components(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")["component"]
        .to_dict()
    )
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 11}

    nodes = spark.createDataFrame(
        pd.DataFrame({"node_id": [0, 1, 2, 3, 10, 11]}).assign(x=0.0, y=0.0)
    )
    edges = spark.createDataFrame(
        pdf.rename(columns={"src": "u", "dst": "v"}).assign(key=0)
    )
    kn, ke = GR.largest_component(nodes, edges, mode="strong")
    assert set(kn.toPandas()["node_id"]) == {0, 1, 2, 3}
    kep = ke.toPandas()
    # the exit edge 3→10 must NOT leak into the strong subgraph
    assert set(zip(kep["u"], kep["v"])) == {(0, 1), (1, 2), (2, 3), (3, 0)}


def test_interstitial_rule_matches_independent_nx_computation(spark):
    """Build a directed multigraph in nx, compute the collapsibility rule
    from nx degree views (an independent implementation), compare."""
    rng = np.random.default_rng(7)
    rows = []
    # a long two-way street + branches + a oneway chain
    for i in range(10):
        rows.append((i, i + 1, 0, "r"))
        rows.append((i + 1, i, 0, "r"))
    rows.append((3, 100, 0, "r"))  # branch at node 3
    for i in range(20, 25):
        rows.append((i, i + 1, 0, "r"))  # oneway chain
    rows.append((22, 22, 0, "r"))  # self loop at 22
    pdf = pd.DataFrame(rows, columns=["u", "v", "key", "highway"])

    g = nx.MultiDiGraph()
    for r in pdf.itertuples(index=False):
        g.add_edge(r.u, r.v, key=r.key, highway=r.highway)

    expected = set()
    for n in g.nodes:
        if g.has_edge(n, n):
            continue
        preds = {p for p in g.predecessors(n) if p != n}
        succs = {s for s in g.successors(n) if s != n}
        in_deg = sum(1 for p, _, _ in g.in_edges(n, keys=True) if p != n)
        out_deg = sum(1 for _, s, _ in g.out_edges(n, keys=True) if s != n)
        nbrs = preds | succs
        if len(nbrs) == 2 and in_deg == out_deg and in_deg in (1, 2) and in_deg > 0:
            expected.add(n)

    edges = spark.createDataFrame(pdf)
    mine = set(
        GR.interstitial_nodes(edges, ["highway"]).toPandas()["node"]
    )
    assert mine == expected
    assert 3 not in mine  # branch node
    assert 22 not in mine  # self loop
    assert 21 in mine  # interior of the oneway chain
