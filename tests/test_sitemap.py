"""Sitemap ingestion (fuzi_rd/sources/sitemap.py)."""

from __future__ import annotations

import gzip

import pyarrow as pa

from fuzi_rd.sources.sitemap import (
    make_sitemap,
    make_sitemap_index,
    parse_sitemap_bytes,
)


def test_roundtrip_urlset():
    urls = ["https://a.test/1", "https://b.test/x?a=1&b=2", "https://c.test/<odd>"]
    data = make_sitemap(urls, ["2026-01-01", None, "2026-02-02"], ["daily", None, None])
    cols = parse_sitemap_bytes(data, "s.xml")
    assert cols["loc"] == urls  # entity escaping round-trips
    assert cols["lastmod"] == ["2026-01-01", None, "2026-02-02"]
    assert cols["changefreq"] == ["daily", None, None]
    assert cols["is_index"] == [False, False, False]


def test_gzip_member_and_index():
    idx = make_sitemap_index(["https://a.test/s1.xml", "https://a.test/s2.xml.gz"])
    cols = parse_sitemap_bytes(gzip.compress(idx), "idx.xml.gz")
    assert cols["loc"] == ["https://a.test/s1.xml", "https://a.test/s2.xml.gz"]
    assert cols["is_index"] == [True, True]


def test_prefixed_namespace_and_junk():
    prefixed = b"""<?xml version="1.0"?>
    <sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sm:url><sm:loc>https://p.test/1</sm:loc></sm:url>
      <sm:url><notloc>nope</notloc></sm:url>
    </sm:urlset>"""
    cols = parse_sitemap_bytes(prefixed, "p.xml")
    assert cols["loc"] == ["https://p.test/1"]  # url without loc skipped

    assert parse_sitemap_bytes(b"<html><body>not a sitemap</body></html>", "x")[
        "loc"
    ] == []
    assert parse_sitemap_bytes(b"\x00\xff garbage", "x")["loc"] == []


def test_writer_reader_dataset_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray

    from fuzi_rd.sources.pages import pages_table
    from fuzi_rd.sources.sitemap import (
        read_sitemap_dataset,
        write_sitemaps_from_pages,
    )

    tbl = pages_table(120)
    src = tmp_path / "pages.parquet"
    pq.write_table(tbl, src)
    sm_dir = write_sitemaps_from_pages(str(src), str(tmp_path / "sm"), urls_per_file=50)
    out = read_sitemap_dataset(sm_dir).take_all()
    non_index = [r for r in out if not r["is_index"]]
    index = [r for r in out if r["is_index"]]
    # every page url recovered exactly once, from 3 shard files (50/50/20)
    assert sorted(r["loc"] for r in non_index) == sorted(
        tbl.column("url").to_pylist()
    )
    assert len({r["sitemap_file"] for r in non_index}) == 3
    # gzip shard (odd index) parsed too
    assert any(r["sitemap_file"].endswith(".xml.gz") for r in non_index)
    # the index file lists the 3 shards
    assert len(index) == 3
    # idempotent: second write is a no-op, reader output unchanged
    write_sitemaps_from_pages(str(src), str(tmp_path / "sm"), urls_per_file=50)
    out2 = read_sitemap_dataset(sm_dir).take_all()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_frontier_urls_query(ray_session):
    """The composed frontier query: discovered minus crawled, exact set."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    # run against the smallest tier; the query derives everything from the
    # synthesized page table, so the expected set is computable here
    out = e.queries()["frontier_urls"]("/root/testdata/sf0.001")
    got = sorted(r["url"] for r in out.take_all())
    from fuzi_rd.sources.pages import pages_table

    # _pages_dir_for(sf0.001) synthesizes 200 pages (same generator)
    urls = pages_table(200).column("url").to_pylist()
    want = sorted(u for u in urls if int(u.rsplit("/", 1)[1]) % 3 != 0)
    assert got == want
