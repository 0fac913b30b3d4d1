"""Duplicate-span detection (fuzi_rd.functions.spans)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fuzi_rd.functions.dedup import _token_hashes
from fuzi_rd.functions.spans import (
    _B1,
    _rolling_fps,
    duplicate_span_scrub,
    duplicate_spans,
)


def _docs(texts) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_rolling_fps_matches_naive():
    rng = np.random.RandomState(7)
    th = rng.randint(0, 2**63, size=37).astype(np.uint64)
    w = 5
    got = _rolling_fps(th, w, _B1)
    # naive O(n*w) polynomial hash with uint64 wraparound
    for i in range(len(th) - w + 1):
        acc = np.uint64(0)
        for j in range(w):
            acc = acc * np.uint64(_B1) + th[i + j]
        assert got[i] == acc, i
    assert len(got) == len(th) - w + 1


def test_rolling_fps_short_doc():
    th = np.arange(3, dtype=np.uint64)
    assert len(_rolling_fps(th, 5, _B1)) == 0


def test_equal_windows_equal_fps_different_context():
    """The same token sequence embedded in different surroundings must
    produce the same fingerprint at its offset."""
    a = "x y common one two three four q".lower().split()
    b = "zz common one two three four w v u".lower().split()
    fa = _rolling_fps(_token_hashes(a), 5, _B1)
    fb = _rolling_fps(_token_hashes(b), 5, _B1)
    # 'common one two three four' starts at 2 in a, 1 in b
    assert fa[2] == fb[1]
    assert fa[0] != fb[0]


def test_duplicate_spans_planted(ray_session):
    import ray

    shared = "alpha beta gamma delta epsilon"
    docs = _docs(
        [
            f"lead in words {shared} tail one",  # doc 0: shared at 3
            f"{shared} completely different ending here",  # doc 1: shared at 0
            "no overlap at all in this document text",  # doc 2
        ]
    )
    out = duplicate_spans(
        ray.data.from_arrow(docs), w=5, max_bucket=None
    ).take_all()
    got = sorted((r["doc_id"], r["tok_start"]) for r in out)
    assert got == [(0, 3), (1, 0)]


def test_duplicate_spans_same_doc_repeat_excluded(ray_session):
    import ray

    # window repeated twice WITHIN one doc, never across docs
    docs = _docs(["a b c d e ... a b c d e", "totally different text here now"])
    out = duplicate_spans(ray.data.from_arrow(docs), w=5).take_all()
    assert out == []


def test_duplicate_spans_cap_deterministic(ray_session):
    import ray

    shared = "one two three four five"
    docs = _docs([f"{shared} suffix{i}" for i in range(20)])
    out = duplicate_spans(
        ray.data.from_arrow(docs), w=5, max_bucket=4
    ).take_all()
    got = sorted((r["doc_id"], r["tok_start"]) for r in out)
    assert got == [(0, 0), (1, 0), (2, 0), (3, 0)]


# ---------------------------------------------------------------------------
# scrub (removal) form


def test_duplicate_span_scrub_removes_shared_window(ray_session):
    import ray

    shared = "alpha beta gamma delta epsilon"
    docs = _docs(
        [
            f"lead in words {shared} tail one",
            f"{shared} completely different ending here",
            "no overlap at all in this document text",
        ]
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in duplicate_span_scrub(ray.data.from_arrow(docs), w=5).take_all()
    }
    assert out[0] == "lead in words tail one"
    assert out[1] == "completely different ending here"
    # untouched doc: tokens normalized (lowercase, single-space) but intact
    assert out[2] == "no overlap at all in this document text"


def test_duplicate_span_scrub_overlapping_windows_union(ray_session):
    import ray

    # docs share a 6-token run -> two overlapping 5-windows; the union of
    # their coverage (all 6 tokens) must be removed, not double-counted
    run = "p q r s t u"
    docs = _docs([f"{run} xx", f"yy {run}"])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in duplicate_span_scrub(ray.data.from_arrow(docs), w=5).take_all()
    }
    assert out[0] == "xx"
    assert out[1] == "yy"


def test_duplicate_span_scrub_no_dups_short_circuit(ray_session):
    import ray

    docs = _docs(["Unique   Words here", "other text entirely", None])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in duplicate_span_scrub(ray.data.from_arrow(docs), w=5).take_all()
    }
    # normalization only: lowercase, whitespace collapsed; null -> ''
    assert out == {0: "unique words here", 1: "other text entirely", 2: ""}
