"""Dedup-grade URL canonicalization + URL-level dedup (urltools.py)."""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzi_rd.functions.urltools import (
    TRACKING_EXACT,
    canonicalize_urls,
    url_canonical_batch,
    url_dedup,
)


def _py_canon(u):
    """Straight-Python reference of the 6-step contract (the semantic
    twin the vectorized kernel must match byte-for-byte)."""
    if u is None:
        return None
    u0 = u.split("#", 1)[0]
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", u0)
    pre = m.group(0).lower() if m else ""
    rest = u0[len(m.group(0)) :] if m else u0
    pre = re.sub(r"^(http://[^:/?#]*):80$", r"\1", pre)
    pre = re.sub(r"^(https://[^:/?#]*):443$", r"\1", pre)
    if "?" in rest:
        path, q = rest.split("?", 1)
    else:
        path, q = rest, ""
    kept = "&".join(
        p
        for p in q.split("&")
        if not (p.startswith("utm_") or p.split("=", 1)[0] in TRACKING_EXACT)
    )
    if pre and path == "":
        path = "/"
    return pre + path + ("?" + kept if kept else "")


EDGE_CASES = [
    "HTTPS://Host1.com:443/a?utm_source=x&id=3#frag",
    "http://h.com:80",
    "http://h.com:8080/x",
    "rel/path?gclid=1",
    "https://x.io?",
    "https://X.IO/P?id=1&utm_campaign=c&ref=h",
    "https://a.b/p?&&",
    "ftp://Case.Host/File",
    "",
    "https://h.com/p?a=b=c&GCLID=1",  # exact set is case-sensitive
    "http://h.com:80/",
    "https://h.com:443",
    "https://h.com/p#a#b",
    "https://h.com/p?utm_x&gclid",
    "scheme+x-y://UP.Host:443/q",  # :443 only strips for https
    None,
    "https://h.com/P?x=1?y=2&utm_a=1",  # later '?' belongs to the query
    "http://h.com:800/x",  # :800 is not :80
    "https://user@h.com:443/x",  # authority incl. userinfo, still lowered
]


def test_canonicalize_edge_cases_match_python_reference():
    got = canonicalize_urls(pa.array(EDGE_CASES, pa.string())).to_pylist()
    assert got == [_py_canon(c) for c in EDGE_CASES]


def test_canonicalize_goldens():
    got = canonicalize_urls(
        pa.array(
            [
                "HTTPS://Host1.com:443/a?utm_source=x&id=3#frag",
                "https://x.io?",
                "http://h.com:80",
            ]
        )
    ).to_pylist()
    assert got == [
        "https://host1.com/a?id=3",
        "https://x.io/",
        "http://h.com/",
    ]


def test_canonicalize_empty_and_null_only():
    assert canonicalize_urls(pa.array([], pa.string())).to_pylist() == []
    assert canonicalize_urls(
        pa.array([None, None], pa.string())
    ).to_pylist() == [None, None]


_URL_ALPHABET = st.text(
    alphabet="abXY01#?&=:/._-%~+@",
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_URL_ALPHABET, max_size=8))
def test_canonicalize_fuzz_matches_python_reference(fragments):
    # bias toward URL-shaped strings but keep raw garbage in the mix
    urls = fragments + [
        "HTTP://Ex.COM:80/" + f + "?utm_a=1&" + f for f in fragments[:3]
    ]
    got = canonicalize_urls(pa.array(urls, pa.string())).to_pylist()
    assert got == [_py_canon(u) for u in urls]


def test_url_canonical_batch_appends_column():
    t = pa.table({"doc_id": [1, 2], "url": ["http://A.b:80/x#f", None]})
    out = url_canonical_batch(t)
    assert out.column_names == ["doc_id", "url", "canon_url"]
    assert out.column("canon_url").to_pylist() == ["http://a.b/x", None]


def test_url_dedup_keeper_and_counts(ray_session):
    import ray

    rows = [
        # three spellings of ONE page -> keeper doc_id 1, n_dups 3
        {"doc_id": 3, "url": "https://Ex.com:443/p?utm_s=1"},
        {"doc_id": 1, "url": "HTTPS://ex.COM/p#frag"},
        {"doc_id": 7, "url": "https://ex.com/p?gclid=x"},
        # distinct page on the same host
        {"doc_id": 2, "url": "https://ex.com/q"},
    ]
    out = url_dedup(ray.data.from_items(rows)).take_all()
    by_url = {r["canon_url"]: r for r in out}
    assert set(by_url) == {"https://ex.com/p", "https://ex.com/q"}
    assert by_url["https://ex.com/p"]["doc_id"] == 1
    assert by_url["https://ex.com/p"]["n_dups"] == 3
    assert by_url["https://ex.com/q"]["n_dups"] == 1
