"""PageRank over edge-list Datasets (functions/graph.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ref_pagerank(edges, n_nodes, damping=0.85, n_iter=10, weights=None):
    """Dense numpy reference with identical semantics: R = (1-d) + d*M R,
    M[v,u] = w(u,v)/outw(u); no dangling redistribution; R0 = 1."""
    M = np.zeros((n_nodes, n_nodes))
    w = weights if weights is not None else [1.0] * len(edges)
    outw = np.zeros(n_nodes)
    for (u, v), ww in zip(edges, w):
        outw[u] += ww
    for (u, v), ww in zip(edges, w):
        M[v, u] += ww / outw[u]
    r = np.ones(n_nodes)
    for _ in range(n_iter):
        r = (1 - damping) + damping * (M @ r)
    return r


def _edges_ds(ray, edges, weights=None):
    t = {
        "src": pa.array([f"n{u}" for u, _ in edges]),
        "dst": pa.array([f"n{v}" for _, v in edges]),
    }
    if weights is not None:
        t["w"] = pa.array(weights, pa.float64())
    return ray.data.from_arrow(pa.table(t))


def test_pagerank_matches_dense_reference(ray_session):
    import ray

    from fuzi_rd.functions.graph import pagerank

    # 5-node graph with a hub, a chain, and a dangling node (n4)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 4)]
    out = pagerank(_edges_ds(ray, edges), n_iter=10).take_all()
    got = {r["node"]: r["rank"] for r in out}
    ref = _ref_pagerank(edges, 5, n_iter=10)
    assert set(got) == {f"n{i}" for i in range(5)}
    for i in range(5):
        assert got[f"n{i}"] == pytest.approx(ref[i], rel=1e-9)


def test_pagerank_weighted_edges(ray_session):
    import ray

    from fuzi_rd.functions.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 0), (2, 0)]
    weights = [3.0, 1.0, 1.0, 1.0]
    out = pagerank(
        _edges_ds(ray, edges, weights), weight_col="w", n_iter=8
    ).take_all()
    got = {r["node"]: r["rank"] for r in out}
    ref = _ref_pagerank(edges, 3, n_iter=8, weights=weights)
    for i in range(3):
        assert got[f"n{i}"] == pytest.approx(ref[i], rel=1e-9)
    # 3x weight on 0->1 must rank n1 above n2
    assert got["n1"] > got["n2"]


def test_pagerank_hub_ranks_highest(ray_session):
    import ray

    from fuzi_rd.functions.graph import pagerank

    # everyone links to n0
    edges = [(i, 0) for i in range(1, 6)]
    out = pagerank(_edges_ds(ray, edges), n_iter=5).take_all()
    got = {r["node"]: r["rank"] for r in out}
    assert got["n0"] == max(got.values())


def test_domain_components_site_families(ray_session):
    """Two link families and an isolated self-loop domain resolve into
    exactly the right component partitions; labels are stable ids."""
    import ray

    from fuzi_rd.functions.graph import domain_components

    edges = [
        ("a.com", "b.com"),
        ("b.com", "c.com"),       # family 1: a-b-c
        ("x.org", "y.org"),       # family 2: x-y
        ("solo.net", "solo.net"), # isolated self-loop
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_domain": pa.array([e[0] for e in edges], pa.string()),
                "dst_domain": pa.array([e[1] for e in edges], pa.string()),
            }
        )
    )
    stats = {}
    rows = domain_components(ds, stats=stats).take_all()
    comp = {r["domain"]: r["component"] for r in rows}
    assert set(comp) == {"a.com", "b.com", "c.com", "x.org", "y.org", "solo.net"}
    assert comp["a.com"] == comp["b.com"] == comp["c.com"]
    assert comp["x.org"] == comp["y.org"]
    assert comp["a.com"] != comp["x.org"] != comp["solo.net"]
    assert stats.get("rounds", 0) >= 1
