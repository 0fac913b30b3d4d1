"""Link extraction + the domain-level web graph.

The webgraph is the other first-class product of a crawl besides the text:
outlinks drive crawl frontier ranking, spam/SEO-farm detection, and
PageRank-style quality priors for corpus curation.

``ExtractLinks`` is an actor-pool ``map_batches`` stage (same shape as
``ExtractPages``, reference precedent Sources/Actor.swift:278-405 — warm
parser state per actor, value rows across the boundary): parse each page
(C kernel with Python fallback), flat-scan the arena for anchor elements,
resolve hrefs against the page url (honoring ``<base href>``), and emit
ROW-EXPANDING (src_url, dst_url, anchor, nofollow) rows — a streaming
flat_map inside map_batches, no shuffle.

``link_graph`` rolls the edge list up to registered-domain granularity:
vectorized host/domain extraction, then one groupby on (src_domain,
dst_domain) — the only exchange, carrying fixed-width-ish domain pairs,
never page HTML.

Scale notes (100 TB): ``max_links_per_page`` caps row expansion (link
farms publish 10k+ anchors per page; the cap bounds both batch memory and
the groupby's skew).  Per-page work is one parse (shared with extraction
when composed) + one O(nodes) scan.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

import pyarrow as pa

from fuzi_rd.dom import ELEMENT
from fuzi_rd.html_parser import parse_html_bytes

DEFAULT_MAX_LINKS = 1000
_KEEP_SCHEMES = ("http", "https")


def _page_links(arena, base_url: str, max_links: int) -> list[tuple[str, str, bool]]:
    """(dst_url, anchor_text, nofollow) for each anchor, in document order.

    Resolution: first ``<base href>`` wins (HTML semantics), else the page
    url.  Only http(s) results are kept — mailto:/javascript:/data: are
    not crawl edges.  Anchor text is the element's string-value, capped.
    """
    names = arena.names
    types = arena.types
    attrs = arena.attrs
    dead = arena.dead

    base = base_url
    out: list[tuple[str, str, bool]] = []
    for nid in range(1, len(types)):
        if dead[nid] or types[nid] != ELEMENT:
            continue
        name = names[nid]
        if name == "base" and base is base_url:
            a = attrs[nid]
            href = a.get("href") if a else None
            if href:
                base = urljoin(base_url, href.strip())
            continue
        if name != "a":
            continue
        a = attrs[nid]
        href = a.get("href") if a else None
        if not href:
            continue
        try:
            dst = urljoin(base, href.strip())
            scheme = urlsplit(dst).scheme.lower()
        except ValueError:
            continue
        if scheme not in _KEEP_SCHEMES:
            continue
        rel = (a.get("rel") or "").lower()
        anchor = arena.string_value(nid).strip()[:200]
        out.append((dst, anchor, "nofollow" in rel.split()))
        if len(out) >= max_links:
            break
    return out


class ExtractLinks:
    """Callable class for ``ds.map_batches(ExtractLinks, concurrency=N,
    batch_format="pyarrow")`` over (url, html) pages.  Emits one row per
    kept anchor: (src_url, dst_url, anchor, nofollow)."""

    def __init__(self, max_links_per_page: int = DEFAULT_MAX_LINKS):
        self.max_links = max_links_per_page
        try:
            from fuzi_rd import chtml

            self._chtml = chtml if chtml.available() else None
        except Exception:
            self._chtml = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src, dst, anchor, nofollow = [], [], [], []
        for url, raw in zip(urls, htmls):
            raw = raw or b""
            try:
                arena = None
                if self._chtml is not None:
                    try:
                        arena = self._chtml.parse_html_bytes_fast(raw)
                    except Exception:
                        arena = None  # Python parser is the authority
                if arena is None:
                    arena = parse_html_bytes(raw, track_lines=False)
                links = _page_links(arena, url, self.max_links)
            except Exception:
                continue  # poison-pill tolerance: a broken page has no edges
            for d, a, nf in links:
                src.append(url)
                dst.append(d)
                anchor.append(a)
                nofollow.append(nf)
        return pa.table(
            {
                "src_url": pa.array(src, pa.string()),
                "dst_url": pa.array(dst, pa.string()),
                "anchor": pa.array(anchor, pa.large_string()),
                "nofollow": pa.array(nofollow, pa.bool_()),
            }
        )


def extract_links_dataset(
    pages_ds,
    max_links_per_page: int = DEFAULT_MAX_LINKS,
    concurrency=None,
    batch_size: int = 256,
):
    """Wire ExtractLinks onto a (url, html) Dataset (lazy)."""
    import ray

    if concurrency is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, int(n_cpus * 0.75))
    return pages_ds.map_batches(
        ExtractLinks,
        fn_constructor_kwargs={"max_links_per_page": max_links_per_page},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def links_from_extracted(extracted_ds):
    """Flatten the fused ``links`` column emitted by
    ``ExtractPages(emit_links=True)`` into the standalone edge-list schema
    (src_url, dst_url, anchor, nofollow) — row-identical to
    :func:`extract_links_dataset` over the same pages (pinned by test),
    but WITHOUT a second HTML parse: the edges were produced inside the
    one parse the extraction/corpus job already pays for.

    Pure Arrow kernels (list_parent_indices gather + struct flatten), no
    Python loop, no exchange; feed the result to :func:`link_graph` /
    ``domain_components`` / ``pagerank`` exactly like the standalone
    extractor's output."""
    import pyarrow.compute as pc

    def _flat(batch: pa.Table) -> pa.Table:
        col = batch.column("links")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        src = pc.take(batch.column("url"), pc.list_parent_indices(col))
        flat = col.flatten()
        return pa.table(
            {
                "src_url": pc.cast(src, pa.string()),
                "dst_url": flat.field("dst_url"),
                "anchor": flat.field("anchor"),
                "nofollow": flat.field("nofollow"),
            }
        )

    return extracted_ds.map_batches(_flat, batch_format="pyarrow")


def link_graph(links_ds, drop_nofollow: bool = True, drop_self: bool = True):
    """Domain-level edge weights from a (src_url, dst_url, nofollow) edge
    list: (src_domain, dst_domain, n_links).  One groupby exchange on the
    domain pair; hosts/domains are extracted vectorized per batch."""
    import pyarrow.compute as pc

    from fuzi_rd.functions.urltools import extract_hosts, registered_domains

    def to_domains(batch: pa.Table) -> pa.Table:
        if drop_nofollow:
            batch = batch.filter(pc.invert(batch.column("nofollow")))
        s = registered_domains(extract_hosts(batch.column("src_url")))
        d = registered_domains(extract_hosts(batch.column("dst_url")))
        out = pa.table({"src_domain": s, "dst_domain": d})
        if drop_self:
            out = out.filter(
                pc.invert(
                    pc.equal(out.column("src_domain"), out.column("dst_domain"))
                )
            )
        return out

    edges = links_ds.map_batches(to_domains, batch_format="pyarrow")
    return edges.groupby(["src_domain", "dst_domain"]).count()


def anchor_text_rollup(links_ds, min_count: int = 2, max_anchor_chars: int = 80):
    """What the web calls each destination: (dst_domain, anchor, n_links)
    for every anchor string used at least ``min_count`` times toward a
    domain — the classic anchor-text signal for search relevance and
    SEO-spam detection (a domain whose inbound anchors are all 'cheap
    pills' tells you something its own pages don't).

    Scale shape: anchors are normalized (lowercase, whitespace-collapsed,
    length-capped) inside ``map_batches``, then ONE groupby on the
    (domain, anchor) pair; the exchange carries short capped strings.
    ``min_count`` prunes the long tail at the output, not the shuffle —
    at crawl scale add a per-batch pre-count combiner if the tail
    dominates (same pattern as ``token_counts``)."""
    import pyarrow.compute as pc

    from fuzi_rd.functions.urltools import extract_hosts, registered_domains

    def normalize(batch: pa.Table) -> pa.Table:
        dst = registered_domains(extract_hosts(batch.column("dst_url")))
        anchor = pc.utf8_slice_codeunits(
            pc.replace_substring_regex(
                pc.utf8_trim_whitespace(
                    pc.utf8_lower(batch.column("anchor"))
                ),
                r"\s+",
                " ",
            ),
            0,
            max_anchor_chars,
        )
        # anchors arrive large_string; the rollup key is a capped short
        # string — cast so empty and non-empty blocks agree on schema
        out = pa.table(
            {"dst_domain": dst, "anchor": pc.cast(anchor, pa.string())}
        )
        return out.filter(pc.not_equal(out.column("anchor"), ""))

    counts = links_ds.map_batches(normalize, batch_format="pyarrow").groupby(
        ["dst_domain", "anchor"]
    ).count()

    def finalize(b: pa.Table) -> pa.Table:
        want = pa.schema(
            [
                ("dst_domain", pa.string()),
                ("anchor", pa.string()),
                ("n_links", pa.int64()),
            ]
        )
        if b.num_columns != 3:  # schema-less empty aggregate block
            return want.empty_table()
        b = b.rename_columns(["dst_domain", "anchor", "n_links"])
        return b.filter(pc.greater_equal(b.column("n_links"), min_count))

    return counts.map_batches(finalize, batch_format="pyarrow")
