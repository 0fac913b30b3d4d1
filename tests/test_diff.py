"""Crawl-snapshot diff (fuzi_rd.functions.diff)."""

from __future__ import annotations

import pyarrow as pa

from fuzi_rd.functions.diff import crawl_diff


def _snap(rows) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_crawl_diff_all_classes(ray_session):
    import ray

    old = _snap(
        [
            ("u/same", "identical content"),
            ("u/changed", "old content"),
            ("u/removed", "gone next crawl"),
            ("u/null-same", None),
        ]
    )
    new = _snap(
        [
            ("u/same", "identical content"),
            ("u/changed", "NEW content"),
            ("u/added", "brand new page"),
            ("u/null-same", None),
        ]
    )
    out = {
        r["url"]: r["change"]
        for r in crawl_diff(
            ray.data.from_arrow(old), ray.data.from_arrow(new)
        ).take_all()
    }
    assert out == {
        "u/same": "same",
        "u/changed": "changed",
        "u/removed": "removed",
        "u/added": "added",
        "u/null-same": "same",  # null text hashes as ''
    }


def test_crawl_diff_disjoint_and_counts(ray_session):
    import ray

    old = _snap([(f"o/{i}", f"t{i}") for i in range(50)])
    new = _snap([(f"n/{i}", f"t{i}") for i in range(30)])
    out = crawl_diff(ray.data.from_arrow(old), ray.data.from_arrow(new)).take_all()
    counts: dict[str, int] = {}
    for r in out:
        counts[r["change"]] = counts.get(r["change"], 0) + 1
    assert counts == {"removed": 50, "added": 30}
