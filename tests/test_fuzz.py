"""Property-based robustness: the parsers must never crash, hang, or blow
the recursion limit on arbitrary input — they either produce an arena or
raise ParseError (reference precedent: random-bytes smoke,
ActorHardeningTests.swift:38-43; RECOVER-mode parse, Document.swift:125-128).

The extraction stage must additionally be total: ANY byte string becomes a
status row, never an exception (poison-pill tolerance, SURVEY.md §4.2)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzi_rd.errors import ParseError
from fuzi_rd.extract import extract_from_html
from fuzi_rd.html_parser import parse_html_bytes
from fuzi_rd.stages.extractor import ExtractPages
from fuzi_rd.xml_parser import parse_xml_bytes


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_html_parse_total_on_bytes(data):
    try:
        arena = parse_html_bytes(data)
        assert arena.n_nodes() >= 1
    except ParseError:
        pass  # empty / no-root inputs legitimately fail


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_xml_parse_total_on_bytes(data):
    try:
        arena = parse_xml_bytes(data)
        assert arena.n_nodes() >= 0
    except ParseError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1024))
def test_html_parse_total_on_text(text):
    try:
        arena = parse_html_bytes(text.encode("utf-8", "surrogatepass"))
        # string_value never raises on a recovered tree
        if arena.root >= 0:
            arena.string_value(arena.root)
    except (ParseError, UnicodeEncodeError):
        pass


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.binary(max_size=512) | st.just(b"") | st.just(b"<html>" * 50),
        min_size=1,
        max_size=8,
    )
)
def test_extract_stage_is_total(blobs):
    """A batch of arbitrary byte blobs always yields one status row per
    input row with a consistent schema — no exception escapes the stage."""
    batch = pa.table(
        {
            "url": pa.array([f"https://f.test/{i}" for i in range(len(blobs))]),
            "html": pa.array(blobs, pa.binary()),
        }
    )
    out = ExtractPages(num_parts=8)(batch)
    assert len(out) == len(blobs)
    assert set(out.column("status").to_pylist()) <= {"ok", "error"}


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="<>/ab= \"'&;#x!-", max_size=256))
def test_extract_from_html_markupish_soup(soup):
    """Markup-shaped garbage: extraction either succeeds (byte-stable
    output) or raises ParseError — and succeeds twice identically."""
    data = ("<html><body>" + soup + "</body></html>").encode()
    first = extract_from_html(data)
    again = extract_from_html(data)
    assert first["extracted_text"] == again["extracted_text"]
    assert first["spans"] == again["spans"]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_characters="\x00"
                ),
                max_size=400,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_c4_clean_matches_python_reference(texts):
    """c4_clean_batch's vectorized list-kernel path equals a literal
    Python implementation of the published rules on ARBITRARY text —
    offsets arithmetic, trim set, predicate kernels and page gates all
    pinned at once."""
    from fuzi_rd.functions.textstats import c4_clean_batch

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )

    import re

    # ASCII \S+ run count — the engine's documented word rule (RE2 class,
    # shared with the DuckDB oracle); Python's unicode-aware str.split()
    # would diverge on NBSP-style exotic whitespace
    words = re.compile(r"[^ \t\n\r\f\v]+")

    def ref(t):
        if t is None:
            t = ""
        kept = [ln.strip(" \t\r\f\v") for ln in t.split("\n")]
        kept = [
            ln
            for ln in kept
            if ln.endswith((".", "!", "?", '"'))
            and len(words.findall(ln)) >= 5
            and "javascript" not in ln.lower()
        ]
        if len(kept) < 3 or "lorem ipsum" in t.lower() or "{" in t:
            return None
        return "\n".join(kept), len(kept)

    expect = [(i, *r) for i, t in enumerate(texts) if (r := ref(t))]
    out = c4_clean_batch(batch)
    got = [(r["doc_id"], r["text"], r["n_lines"]) for r in out.to_pylist()]
    assert got == expect
