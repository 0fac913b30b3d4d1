"""robots.txt parser + permission filter (functions/robots.py)."""

from __future__ import annotations

import pyarrow as pa

from fuzi_rd.functions.robots import RobotsPolicy

RULES = """
# fixture policy
User-agent: megabot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /*.tmp$
Disallow: /search
Allow: /search/help
Crawl-delay: 10
"""


def test_basic_prefix_rules():
    p = RobotsPolicy(RULES, agent="fuzi")
    assert p.allowed("/index.html")
    assert not p.allowed("/private/x")
    assert p.allowed("/private/pub/ok")  # longer Allow wins
    assert not p.allowed("/search?q=1")
    assert p.allowed("/search/help/page")


def test_wildcard_and_anchor():
    p = RobotsPolicy(RULES, agent="fuzi")
    assert not p.allowed("/a/b/file.tmp")
    assert p.allowed("/a/b/file.tmp.bak")  # $ anchor: no match
    assert p.allowed("/tmp-dir/file")


def test_agent_group_selection():
    assert not RobotsPolicy(RULES, agent="megabot-2").allowed("/anything")
    assert RobotsPolicy(RULES, agent="fuzi").allowed("/anything")
    # no groups at all -> allow everything
    assert RobotsPolicy("", agent="fuzi").allowed("/x")
    # empty Disallow = allow-all no-op
    assert RobotsPolicy("User-agent: *\nDisallow:", agent="f").allowed("/x")


def test_consecutive_ua_lines_share_group():
    text = "User-agent: a\nUser-agent: b\nDisallow: /x/"
    assert not RobotsPolicy(text, agent="a").allowed("/x/1")
    assert not RobotsPolicy(text, agent="b").allowed("/x/1")
    assert RobotsPolicy(text, agent="c").allowed("/x/1")


def test_tie_length_allow_wins():
    text = "User-agent: *\nDisallow: /dir/\nAllow: /dir*"  # equal len 5
    assert RobotsPolicy(text, agent="f").allowed("/dir/page")


def test_malformed_lines_ignored():
    text = "User-agent *\nnonsense\nUser-agent: *\nDisallow: /no/\n???: x"
    p = RobotsPolicy(text, agent="f")
    assert not p.allowed("/no/1")
    assert p.allowed("/yes")


def test_robots_keep_filter(ray_session):
    import ray

    from fuzi_rd.functions.robots import robots_keep

    urls = [
        "https://a.example.com/ok",
        "https://a.example.com/private/x",
        "https://a.example.com:8080/private/pub/y",  # port stripped
        "https://b.example.com/private/x",  # no policy: kept
        "relative/path",
    ]
    ds = ray.data.from_arrow(
        pa.table({"url": urls, "doc_id": pa.array(range(5), pa.int64())})
    )
    kept = robots_keep(
        ds, policies={"a.example.com": RULES}, agent="fuzi"
    ).take_all()
    assert sorted(r["doc_id"] for r in kept) == [0, 2, 3, 4]


def test_sitemap_directives_collected():
    from fuzi_rd.functions.robots import RobotsPolicy, robots_sitemaps

    text = """# frontier seeds
User-agent: *
Disallow: /private
Sitemap: https://a.test/sitemap-index.xml

User-agent: megabot
Disallow: /
Sitemap: https://a.test/extra.xml.gz
"""
    p = RobotsPolicy(text)
    # Sitemap is global (RFC 9309 sec 2.3): both collected regardless of group
    assert p.sitemaps == [
        "https://a.test/sitemap-index.xml",
        "https://a.test/extra.xml.gz",
    ]
    # rule parsing unaffected by the interleaved Sitemap lines
    assert not p.allowed("/private/x") and p.allowed("/public")

    tbl = robots_sitemaps(
        {
            "b.test": text,
            "a.test": "User-agent: *\nDisallow:",
            "c.test": "Sitemap: https://c.test/s.xml",
        }
    )
    assert tbl.column("host").to_pylist() == ["b.test", "b.test", "c.test"]
    assert tbl.column("sitemap_url").to_pylist()[2] == "https://c.test/s.xml"
