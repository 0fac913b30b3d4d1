"""Differential gate for the batched extraction fast path
(fuzi_rd/fastextract.py): ExtractPages' vectorized `_call_fast` must be
COLUMN-IDENTICAL (everything except the wall-clock parse_us column) to the
per-document Python path on every corpus we can throw at it, or fall back.

Like the C-kernel gate (tests/test_chtml_equivalence.py), the Python path
remains the authority — these tests define when the batched path is allowed
to answer.  Reference parity anchor: the extraction spec itself is pinned
against the reference goldens in tests/test_spans.py / test_parity_html.py;
this suite only pins the fast execution strategy to the spec.
"""

import pathlib

import pyarrow as pa
import pytest

from fuzi_rd import chtml
from fuzi_rd.stages.extractor import ExtractPages

pytestmark = pytest.mark.skipif(
    not chtml.available(), reason="C kernel unavailable (no gcc?)"
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _table(blobs, urls=None):
    urls = urls or [f"u{i}" for i in range(len(blobs))]
    return pa.table(
        {"url": urls, "html": pa.array([bytes(b) for b in blobs], pa.large_binary())}
    )


def _assert_identical(tbl, label="", **kwargs):
    fast = ExtractPages(**kwargs)
    slow = ExtractPages(**kwargs)
    slow._fast = None
    before = ExtractPages.fast_batch_fallbacks
    out_f = fast(tbl)
    assert ExtractPages.fast_batch_fallbacks == before, (
        label,
        "whole-batch safety net fired",
    )
    out_s = slow._call_python(tbl)
    assert out_f.schema == out_s.schema, label
    for name in out_f.schema.names:
        if name == "parse_us":  # wall-clock timing, legitimately different
            continue
        if not out_f.column(name).equals(out_s.column(name)):
            fa = out_f.column(name).to_pylist()
            sa = out_s.column(name).to_pylist()
            diffs = [
                (i, fa[i], sa[i]) for i in range(len(fa)) if fa[i] != sa[i]
            ][:3]
            raise AssertionError((label, name, diffs))


def test_fast_path_enabled_for_core_job():
    ep = ExtractPages()
    assert ep._fast is not None, "fast path must engage for the core job"


def test_fast_path_disabled_when_dom_products_requested():
    # recipes / fused markdown / metadata need the full Arena DOM
    assert ExtractPages(recipe={"h1": "//h1"})._fast is None
    assert ExtractPages(emit_markdown=True)._fast is None
    assert ExtractPages(emit_metadata=True)._fast is None
    # fused links read the kernel attr arrays directly — fast stays on
    assert ExtractPages(emit_links=True)._fast is not None


def test_fixture_corpus_identical():
    blobs = [
        p.read_bytes()
        for p in sorted(FIXTURES.glob("*.html")) + sorted(FIXTURES.glob("*.xml"))
    ]
    assert blobs
    _assert_identical(_table(blobs), "fixtures")


def test_synthesized_pages_identical():
    from fuzi_rd.sources.pages import pages_table

    for start in (0, 7000):
        tbl = pages_table(300, start=start)
        _assert_identical(tbl, f"pages[{start}]")


def test_skew_pages_identical():
    from fuzi_rd.sources.pages import skew_pages_table

    _assert_identical(skew_pages_table(120, start=0, huge_every=40), "skew")


ADVERSARIAL = [
    b"",  # empty -> error row both
    b"   \n\t  ",  # whitespace only -> no-root error both
    b"no tags at all, just text",
    b"&nbsp;&nbsp;",  # doc-level entity-whitespace: kernel declines per-doc
    b"<p>a &lt; b &amp;&amp; c &gt; d</p>",
    b"<div><p>one<p>two<ul><li>x<li>y</ul></div>",
    b"<table><tr><td>a<td>b<tr><td>c</table>",
    b"<SCRIPT>if (a<b) { alert('</div>'); }</SCRIPT>ok",
    b"<style>p > a { color: red; }</style><p>t</p>",
    b"<script>never closed...",
    b"<!-- unterminated comment",
    b"<!DOCTYPE html><html><body>x</body></html>",
    b"<?php echo 'hi'; ?><p>x</p>",
    # density decisions: link-heavy vs text-heavy blocks
    b"<a href=x>" + b"L" * 500 + b"</a>",
    b"<a href='u'>" + b"link " * 50 + b"</a><p>" + b"text " * 200 + b"</p>",
    b"<article>" + (b"<p>" + b"s" * 40 + b"</p>") * 20 + b"</article>",
    # candidate INSIDE an ancestor <a> (the link-cover fix-up path)
    b"<a href=x><div><p>" + b"t" * 400 + b"</p></div></a>",
    # body fallback (no block candidates)
    b"<body>" + b"x" * 10 + b"</body>",
    # sibling-index paths: repeated same-named siblings, mixed case
    b"<div><p>a</p><p>bbbbbbbb</p><P>" + b"c" * 300 + b"</P></div>",
    b"<DIV><SPAN>x</SPAN>" + b"w " * 150 + b"</DIV>",
    # >16-byte and unicode tag names (pack fallback paths)
    b"<verylongtagnameexceeding16bytes><p>"
    + b"q" * 300
    + b"</p></verylongtagnameexceeding16bytes>",
    "<χtag><p>".encode() + b"z" * 300 + "</p></χtag>".encode(),
    # titles: entities, '<' pieces, nested elements, late/duplicate heads
    b"<title>T &amp; t &lt;u&gt;</title><p>" + b"w" * 250 + b"</p>",
    b"<head><title>a<b>c</b>d</title></head><p>" + b"y" * 250 + b"</p>",
    # non-ASCII content (UTF-8 char-count path) + declared charsets
    "<p>café 中文 — “quotes” &amp; more:".encode() + b"z" * 300 + b"</p>",
    b'<meta charset="utf-8"><p>' + b"m" * 300 + b"</p>",
    b'<meta charset="UTF-8"><p>caf\xc3\xa9 ' + b"m" * 300 + b"</p>",
    b'<meta charset="latin-1"><p>caf\xe9 ' + b"m" * 300 + b"</p>",
    b'<meta charset="ascii"><p>' + b"m" * 300 + b"</p>",
    b"\xef\xbb\xbf<p>bom " + b"m" * 300 + b"</p>",
    b"\xff\xfe<p>bad bom</p>",
    # invalid utf-8 with a charset claim (replacement-char path)
    b'<meta charset="utf-8"><p>bad \xff\xfe\xfa ' + b"m" * 300 + b"</p>",
]


def test_adversarial_identical():
    _assert_identical(_table(ADVERSARIAL), "adversarial")
    # and all of them as single-row batches (per-doc edge handling)
    for i, case in enumerate(ADVERSARIAL):
        _assert_identical(_table([case]), f"adversarial[{i}]")


def test_no_spans_identical():
    from fuzi_rd.sources.pages import pages_table

    _assert_identical(pages_table(200, start=100), "nospans", emit_spans=False)
    _assert_identical(_table(ADVERSARIAL), "nospans-adv", emit_spans=False)


def test_fuzz_no_divergence():
    import random

    rng = random.Random(1234)
    alphabet = b"<>/=\"' abcdefghijklmnop&;!?-\tp\n\xc3\xa9\xe2\x80\x88"
    blobs = [
        bytes(rng.choice(alphabet) for _ in range(rng.randint(0, 300)))
        for _ in range(200)
    ]
    rng2 = random.Random(77)
    blobs += [
        bytes(rng2.randrange(256) for _ in range(rng2.randint(0, 200)))
        for _ in range(200)
    ]
    _assert_identical(_table(blobs), "fuzz")


def test_mixed_batch_with_declines_and_errors():
    """A batch interleaving fast docs, per-doc declines (kernel corner),
    and error rows exercises the merge path in _call_fast."""
    from fuzi_rd.sources.pages import pages_table

    good = pages_table(20, start=50).column("html").to_pylist()
    mixed = []
    for i, g in enumerate(good):
        mixed.append(g)
        if i % 3 == 0:
            mixed.append(b"&nbsp;&nbsp;")  # kernel declines -> python row
        if i % 4 == 0:
            mixed.append(b"")  # ParseError -> error row
    _assert_identical(_table(mixed), "mixed")


def test_batch_extractor_reuse_across_batches():
    """Actor-pool usage: the same BatchExtractor instance must produce
    identical results across consecutive reset/add/finish cycles."""
    from fuzi_rd.sources.pages import pages_table

    ep = ExtractPages()
    t1 = pages_table(60, start=0)
    t2 = pages_table(60, start=60)
    for tbl in (t1, t2, t1):
        _assert_identical(tbl, "reuse")  # fresh instance
        out = ep(tbl)  # reused instance
        slow = ExtractPages()
        slow._fast = None
        ref = slow._call_python(tbl)
        for name in out.schema.names:
            if name == "parse_us":
                continue
            assert out.column(name).equals(ref.column(name)), ("reuse", name)


# ---------------------------------------------------------------------------
# fused emit_links on the fast path: finish_links() must replicate
# stages/links._page_links byte-for-byte (attr lookup, <base href>, scheme
# filter, anchor string-value, nofollow rel, doc-order cap)
# ---------------------------------------------------------------------------

LINK_ADVERSARIAL = [
    # plain / relative / absolute resolution
    b'<a href="/x">one</a><a href="http://e.com/p">two</a>',
    b'<a href="sub/page.html">rel</a><p>t</p>',
    # base href: first wins; later bases ignored; base w/o or empty href
    b'<base href="http://b.com/dir/"><a href="f">x</a>',
    b'<base><base href="http://late.com/"><a href="f">x</a>',
    b'<base href=""><base href="http://second.com/"><a href="f">x</a>',
    b'<a href="early">pre-base</a><base href="http://b.com/"><a href="post">y</a>',
    b'<base href="   "><base href="http://third.com/"><a href="f">x</a>',
    # attr-key casing + duplicate attrs (first occurrence wins)
    b'<A HREF="/up">caps</A>',
    b'<a HREF="/first" href="/second">dup</a>',
    b'<a rel="NOFOLLOW" href="/n">nf</a>',
    b'<a rel="a nofollow b" href="/n2">nf2</a>',
    b'<a rel="nofollowish" href="/n3">not-nf</a>',
    # missing / empty / whitespace / entity-escaped hrefs
    b'<a>no href</a><a href="">empty</a><a href="   ">ws</a>',
    b'<a href="/p?a=1&amp;b=2">ent</a>',
    # non-crawl schemes dropped (and do not count toward the cap)
    b'<a href="mailto:x@y.z">m</a><a href="javascript:void(0)">j</a>'
    b'<a href="ftp://f/">f</a><a href="data:text/plain,x">d</a>'
    b'<a href="https://keep.me/">k</a>',
    # anchor text: entities, '<' pieces, nesting, >200-char cap, strip
    b'<a href="/t">a &lt; b &amp; c</a>',
    b'<a href="/t"><b>bold</b> and <i>ital</i></a>',
    b'<a href="/t">  \n  padded  \t </a>',
    b'<a href="/long">' + b"A" * 500 + b"</a>",
    # nested anchor (parser closes implicitly; both paths see the same tree)
    b'<a href="/o">out<a href="/i">in</a></a>',
    # anchors inside killed-later containers still emit (links are pre-kill)
    b'<nav><a href="/nav1">n1</a><a href="/nav2">n2</a></nav><p>'
    + b"t" * 300
    + b"</p>",
    # urljoin/urlsplit hostile inputs
    b'<a href="http://[bad">broken</a><a href="//proto-rel/p">pr</a>',
    b'<a href="#frag">frag</a><a href="?q=1">query</a>',
    # uppercase BASE + unicode href bytes
    b'<BASE HREF="http://up.com/"><a href="caf\xc3\xa9">u</a>',
]


def test_emit_links_fixture_and_pages_identical():
    from fuzi_rd.sources.pages import pages_table

    blobs = [p.read_bytes() for p in sorted(FIXTURES.glob("*.html"))]
    _assert_identical(_table(blobs), "links-fixtures", emit_links=True)
    _assert_identical(pages_table(300, start=0), "links-pages", emit_links=True)


def test_emit_links_adversarial_identical():
    urls = [f"http://site{i}.test/dir/page.html" for i in range(len(LINK_ADVERSARIAL))]
    _assert_identical(
        _table(LINK_ADVERSARIAL, urls=urls), "links-adv", emit_links=True
    )
    for i, case in enumerate(LINK_ADVERSARIAL):
        _assert_identical(
            _table([case], urls=[urls[i]]), f"links-adv[{i}]", emit_links=True
        )


def test_emit_links_cap_identical():
    many = b"".join(
        b'<a href="/p%d">t%d</a>' % (i, i) for i in range(50)
    )
    _assert_identical(
        _table([b"<div>" + many + b"</div>"]),
        "links-cap",
        emit_links=True,
        max_links_per_page=7,
    )


def test_emit_links_fuzz_identical():
    import random

    rng = random.Random(4321)
    alphabet = b"<>/=\"' abcdefghijklmnop&;!?-\thref=rel=base a\n\xc3\xa9"
    blobs = [
        bytes(rng.choice(alphabet) for _ in range(rng.randint(0, 300)))
        for _ in range(200)
    ]
    _assert_identical(_table(blobs), "links-fuzz", emit_links=True)


def test_emit_links_mixed_batch_identical():
    from fuzi_rd.sources.pages import pages_table

    good = pages_table(20, start=50).column("html").to_pylist()
    mixed = []
    for i, g in enumerate(good):
        mixed.append(g)
        if i % 3 == 0:
            mixed.append(b"&nbsp;&nbsp;")  # decline -> python per-doc links
        if i % 4 == 0:
            mixed.append(b"")  # ParseError -> error row, empty links
    _assert_identical(_table(mixed), "links-mixed", emit_links=True)
