"""Ported golden assertions from the reference's Tests/HTMLTests.swift
(literal expected values over the real-world web.html corpus page)."""

import pytest

from fuzi_rd import ParseError, parse_html
from fuzi_rd.dom import ELEMENT, TEXT
from tests.conftest import load_fixture


@pytest.fixture(scope="module")
def doc():
    return parse_html(load_fixture("web.html"))


def test_root(doc):
    assert doc.root.tag == "html"


def test_root_children(doc):
    children = doc.root.children
    assert len(children) == 2
    assert children[0].tag == "head"
    assert children[-1].tag == "body"


def test_title_xpath(doc):
    els = doc.xpath("//head/title")
    assert len(els) == 1
    assert els[0].string_value == "mattt/Ono"


def test_title_css(doc):
    els = doc.css("head title")
    assert len(els) == 1
    assert els[0].string_value == "mattt/Ono"


def test_id_css(doc):
    els = doc.css("#account_settings")
    assert len(els) == 1
    assert els[0]["href"] == "/settings/profile"


def test_empty_throws():
    with pytest.raises(ParseError):
        parse_html(b"")


def test_title(doc):
    assert doc.title == "mattt/Ono"


def test_head(doc):
    head = doc.head
    assert head is not None
    assert len(head.children_tag("link")) == 13
    assert len(head.children_tag("meta")) == 38
    scripts = head.children_tag("script")
    assert len(scripts) == 2
    assert scripts[0]["src"] == (
        "https://github.global.ssl.fastly.net/assets/"
        "frameworks-3d18c504ea97dc018d44d64d8fce147a96a944b8.js"
    )
    assert scripts[-1]["src"] == (
        "https://github.global.ssl.fastly.net/assets/"
        "github-602f74794536bf3e30e883a2cf268ca8e05b651d.js"
    )
    assert head["prefix"] == (
        "og: http://ogp.me/ns# fb: http://ogp.me/ns/fb# object:"
        " http://ogp.me/ns/object# article: http://ogp.me/ns/article#"
        " profile: http://ogp.me/ns/profile#"
    )


def test_body(doc):
    body = doc.body
    assert body is not None
    assert body["class"] == "logged_in  env-production macintosh vis-public"
    assert len(body.children_tag("div")) == 4


def test_child_nodes_mixed(doc):
    mixed = doc.first_child_css("#ajax-error-message")
    nodes = mixed.child_nodes([ELEMENT, TEXT])
    assert len(nodes) == 5
    assert sum(1 for n in nodes if n.to_element() is not None) == 2
    assert sum(1 for n in nodes if n.type == ELEMENT) == 2
    assert sum(1 for n in nodes if n.type == TEXT) == 3


def test_next_sibling_walk_no_crash(doc):
    child = doc.root.children[0]
    seen = 0
    while child is not None:
        child = child.next_sibling
        seen += 1
        assert seen < 10000
