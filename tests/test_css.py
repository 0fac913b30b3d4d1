"""The 17 CSS->XPath goldens, ported from the reference's
Tests/CSSTests.swift:26-88 (exact string equality — this IS the compiler's
spec)."""

import pytest

from fuzi_rd.css import xpath_from_css

GOLDENS = [
    ("*", ".//*"),
    ("div", ".//div"),
    (
        ".highlighted",
        ".//*[contains(concat(' ',normalize-space(@class),' '),' highlighted ')]",
    ),
    (
        "span.highlighted",
        ".//span[contains(concat(' ',normalize-space(@class),' '),' highlighted ')]",
    ),
    ("h1#logo", ".//h1[@id = 'logo']"),
    ("#logo", ".//*[@id = 'logo']"),
    ("html *", ".//html//*"),
    ("body p", ".//body/descendant::p"),
    ("ul > li", ".//ul/li"),
    ("h1 + p", ".//h1/following-sibling::*[1]/self::p"),
    ("p ~ p", ".//p/following-sibling::p"),
    ("img[alt]", ".//img[@alt]"),
    ("a[rel='next']", ".//a[@rel='next']"),
    ("a[rel='next'][href='/foo/bar']", ".//a[@rel='next'][@href='/foo/bar']"),
    ("ul, ol", ".//ul | .//ol"),
    (
        "div#test .note",
        ".//div[@id = 'test']/descendant::*"
        "[contains(concat(' ',normalize-space(@class),' '),' note ')]",
    ),
    # web-page recipe selectors used by the extraction pipeline
    ("head title", ".//head/descendant::title"),
]


@pytest.mark.parametrize("css,expected", GOLDENS)
def test_css_to_xpath_golden(css, expected):
    assert xpath_from_css(css) == expected
