"""Sitemap ingestion: the crawl frontier's seed source.

A crawl pipeline discovers URLs from sitemaps (sitemaps.org protocol):
``<urlset>`` files carry per-URL ``loc`` / ``lastmod`` / ``changefreq`` /
``priority``; ``<sitemapindex>`` files point at more sitemap files.  This
module provides both directions:

  * a deterministic WRITER that shards a url table into sitemap XML files
    (capped at the protocol's 50k urls/file, gzip for alternating shards)
    — the fixture generator for tests/bench, and a real export for
    publishing;
  * a Ray Data READER: one read task per sitemap file (files are the
    protocol's parallelism unit, like WARC segments), XML parsed with the
    engine's own recovering parser (`fuzi_rd.xml_parser`) inside the read
    task — index files expand to their referenced locs with
    ``is_index=True`` so the caller can recurse.

Scale notes: a site's sitemap tree is small (files are <=50 MB by
protocol); the 100 TB-scale dimension is the NUMBER of files, which maps
one-to-one onto read tasks.  Output rows are fixed-width capped strings;
no shuffle anywhere.

Reference parity note: the XML traversal uses the same arena/DOM the
reference's XMLDocument tests pin (Sources/Document.swift, Node.swift) —
namespaced tag matching is local-name based because real-world sitemaps
mix default-ns, prefixed and un-namespaced documents.
"""

from __future__ import annotations

import gzip
import pathlib

import pyarrow as pa

from fuzi_rd.dom import ELEMENT
from fuzi_rd.xml_parser import parse_xml_bytes

MAX_URLS_PER_FILE = 50_000  # sitemaps.org protocol cap
_CAP = 2048  # per-field char cap

_SCHEMA = pa.schema(
    [
        ("loc", pa.string()),
        ("lastmod", pa.string()),
        ("changefreq", pa.string()),
        ("priority", pa.string()),
        ("is_index", pa.bool_()),
        ("sitemap_file", pa.string()),
    ]
)


def make_sitemap(urls, lastmods=None, changefreqs=None) -> bytes:
    """One deterministic <urlset> document (no namespace gymnastics: the
    standard default xmlns, entity-escaped locs)."""
    lastmods = lastmods or [None] * len(urls)
    changefreqs = changefreqs or [None] * len(urls)
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    out.append('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
    for url, lm, cf in zip(urls, lastmods, changefreqs):
        esc = (
            str(url)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )
        out.append("<url>")
        out.append(f"<loc>{esc}</loc>")
        if lm:
            out.append(f"<lastmod>{lm}</lastmod>")
        if cf:
            out.append(f"<changefreq>{cf}</changefreq>")
        out.append("</url>")
    out.append("</urlset>")
    return "\n".join(out).encode("utf-8")


def make_sitemap_index(sitemap_urls) -> bytes:
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    out.append(
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    )
    for u in sitemap_urls:
        esc = str(u).replace("&", "&amp;").replace("<", "&lt;")
        out.append(f"<sitemap><loc>{esc}</loc></sitemap>")
    out.append("</sitemapindex>")
    return "\n".join(out).encode("utf-8")


def write_sitemaps_from_pages(
    pages_parquet: str, out_dir: str, urls_per_file: int = 500
) -> str:
    """Deterministic sitemap fixture tree from a page/document table:
    shard urls into <urlset> files (alternating .xml / .xml.gz members)
    plus one index file referencing them.  Idempotent (content is a pure
    function of the input table)."""
    import pyarrow.parquet as pq

    out = pathlib.Path(out_dir)
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    tbl = pq.read_table(pages_parquet, columns=["url", "warc_ts"])
    urls = tbl.column("url").to_pylist()
    ts = tbl.column("warc_ts").to_pylist()
    files = []
    for shard, start in enumerate(range(0, len(urls), urls_per_file)):
        chunk = urls[start : start + urls_per_file]
        lm = [
            t.strftime("%Y-%m-%d") if t is not None else None
            for t in ts[start : start + urls_per_file]
        ]
        cf = ["daily" if i % 3 == 0 else None for i in range(len(chunk))]
        data = make_sitemap(chunk, lm, cf)
        if shard % 2 == 1:
            path = out / f"sitemap-{shard:04d}.xml.gz"
            path.write_bytes(gzip.compress(data, mtime=0))
        else:
            path = out / f"sitemap-{shard:04d}.xml"
            path.write_bytes(data)
        files.append(path.name)
    (out / "sitemap-index.xml").write_bytes(
        make_sitemap_index(f"https://fixtures.test/{f}" for f in files)
    )
    done.write_bytes(b"")
    return str(out)


def _local_name(name: str | None) -> str:
    if not name:
        return ""
    return name.rsplit(":", 1)[-1].lower()


def _child_texts(arena, nid: int) -> dict:
    out = {}
    for c in arena.iter_element_children(nid):
        out[_local_name(arena.names[c])] = " ".join(
            arena.string_value(c).split()
        )[:_CAP]
    return out


def parse_sitemap_bytes(data: bytes, source: str) -> dict:
    """One sitemap/sitemapindex document -> column lists (dict of lists)."""
    cols: dict[str, list] = {f.name: [] for f in _SCHEMA}
    if data[:2] == b"\x1f\x8b":  # gzip member
        data = gzip.decompress(data)
    try:
        arena = parse_xml_bytes(data)
    except Exception:  # no root / parser failure: not a sitemap, zero rows
        return cols
    root = arena.root
    if root is None or root < 0:
        return cols
    root_name = _local_name(arena.names[root])
    is_index = root_name == "sitemapindex"
    if root_name not in ("urlset", "sitemapindex"):
        return cols
    want = "sitemap" if is_index else "url"
    for c in arena.iter_element_children(root):
        if arena.types[c] != ELEMENT or _local_name(arena.names[c]) != want:
            continue
        fields = _child_texts(arena, c)
        loc = fields.get("loc")
        if not loc:
            continue
        cols["loc"].append(loc)
        cols["lastmod"].append(fields.get("lastmod"))
        cols["changefreq"].append(fields.get("changefreq"))
        cols["priority"].append(fields.get("priority"))
        cols["is_index"].append(is_index)
        cols["sitemap_file"].append(source)
    return cols


def parse_sitemap_batch(batch: pa.Table) -> pa.Table:
    out: dict[str, list] = {f.name: [] for f in _SCHEMA}
    for path, data in zip(
        batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
    ):
        name = pathlib.Path(path).name
        if name == "_DONE":
            continue
        try:
            cols = parse_sitemap_bytes(data or b"", name)
        except Exception:
            continue  # malformed sitemap: zero rows (poison-pill contract)
        for k, v in cols.items():
            out[k].extend(v)
    return pa.table({f.name: pa.array(out[f.name], f.type) for f in _SCHEMA})


def read_sitemap_dataset(paths):
    """Sitemap files/dir -> Dataset of (loc, lastmod, changefreq, priority,
    is_index, sitemap_file).  One read task per file (the protocol's
    parallelism unit); ``batch_size=1`` keeps one raw file per task heap."""
    import ray

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse_sitemap_batch, batch_format="pyarrow", batch_size=1)
