"""Ported golden assertions from the reference fork's hardening suites:
Tests/ActorTests.swift and Tests/ActorHardeningTests.swift (literal expected
values).  The reference runs these through its XMLActor/HTMLActor; our
equivalents run through the Document facade — the Ray actor-pool stage is
tested separately at the pipeline level."""

import pytest

from fuzi_rd import ParseError, QueryError, parse_html, parse_xml

# -- Error handling edge cases (ActorHardeningTests.swift:31-150) -----------


def test_empty_data_throws():
    with pytest.raises(ParseError):
        parse_xml(b"")


def test_random_bytes_no_crash():
    import random

    rng = random.Random(42)
    data = bytes(rng.randrange(256) for _ in range(100))
    try:
        parse_xml(data)
    except ParseError:
        pass


def test_truncated_xml_recovers():
    doc = parse_xml('<?xml version="1.0"?><root><child>content</chi')
    assert doc.root is not None
    assert doc.root.tag == "root"


def test_mismatched_tags_recover():
    try:
        doc = parse_xml("<root><a></b></root>")
    except ParseError:
        return
    assert doc.root.tag == "root"


def test_invalid_utf8_no_crash():
    data = b'<?xml version="1.0"?><root>' + b"\xff\xfe" + b"</root>"
    try:
        parse_xml(data)
    except ParseError:
        pass


def test_null_bytes_no_crash():
    data = b'<?xml version="1.0"?><root>before' + b"\x00" + b"after</root>"
    try:
        doc = parse_xml(data)
        assert doc.root.tag == "root"
    except ParseError:
        pass


def test_extremely_long_tag_names():
    tag = "a" * 10000
    doc = parse_xml(f"<{tag}/>")
    assert doc.root.tag == tag


def test_deeply_recursive_xml():
    depth = 1000
    xml = "".join(f"<level{i}>" for i in range(depth))
    xml += "deep"
    xml += "".join(f"</level{i}>" for i in reversed(range(depth)))
    doc = parse_xml(xml)
    assert doc.root is not None
    assert doc.root.string_value == "deep"


def test_very_wide_xml():
    width = 5000
    xml = "<root>" + "".join(f"<child{i}/>" for i in range(width)) + "</root>"
    doc = parse_xml(xml)
    assert len(doc.xpath("/root/*")) == width


def test_empty_element_forms():
    doc = parse_xml(
        "<root>\n    <self-closing/>\n    <explicit-empty></explicit-empty>"
        "\n    <whitespace-only>   </whitespace-only>\n</root>"
    )
    assert doc.first_child_xpath("//self-closing").string_value == ""
    assert doc.first_child_xpath("//explicit-empty").string_value == ""
    assert doc.first_child_xpath("//whitespace-only").string_value.strip() == ""


def test_multiple_roots_keeps_first():
    doc = parse_xml("<root1/><root2/>")
    assert doc.root.tag == "root1"


def test_declaration_only_no_root():
    with pytest.raises(ParseError):
        parse_xml('<?xml version="1.0"?>')


# -- XPath edge cases (ActorHardeningTests.swift:309-473) -------------------

ITEMS_XML = """
<root>
    <item id="1" category="a" priority="high">First</item>
    <item id="2" category="b" priority="low">Second</item>
    <item id="3" category="a" priority="low">Third</item>
</root>
"""


def test_stacked_predicates():
    doc = parse_xml(ITEMS_XML)
    res = doc.xpath("//item[@category='a'][@priority='high']")
    assert len(res) == 1
    assert res[0].string_value == "First"


def test_axis_ancestor():
    doc = parse_xml("<a><b><c><d>deep</d></c></b></a>")
    assert len(doc.xpath("//d/ancestor::*")) == 3


def test_axis_following_sibling():
    doc = parse_xml("<root><a/><b/><c/><d/></root>")
    assert len(doc.xpath("//b/following-sibling::*")) == 2


def test_axis_preceding_sibling():
    doc = parse_xml("<root><a/><b/><c/><d/></root>")
    assert len(doc.xpath("//c/preceding-sibling::*")) == 2


def test_position_predicates():
    doc = parse_xml(
        "<root><item>1</item><item>2</item><item>3</item>"
        "<item>4</item><item>5</item></root>"
    )
    assert doc.first_child_xpath("//item[1]").string_value == "1"
    assert doc.first_child_xpath("//item[last()]").string_value == "5"
    assert doc.first_child_xpath("//item[position()=3]").string_value == "3"


def test_string_functions():
    doc = parse_xml("<root><text>  Hello World  </text></root>")
    assert doc.root.eval("normalize-space(//text)").string_value == "Hello World"
    assert doc.root.eval("string-length(normalize-space(//text))").double_value == 11
    assert doc.root.eval("contains(//text, 'World')").bool_value is True
    assert (
        doc.root.eval("starts-with(normalize-space(//text), 'Hello')").bool_value
        is True
    )


def test_numeric_functions():
    doc = parse_xml("<root><n>10</n><n>20</n><n>30</n></root>")
    assert doc.root.eval("sum(//n)").double_value == 60
    assert doc.root.eval("count(//n)").double_value == 3


def test_boolean_logic():
    doc = parse_xml("<root><a>1</a><b>2</b></root>")
    assert doc.root.eval("//a = 1 and //b = 2").bool_value is True
    assert doc.root.eval("//a = 99 or //b = 2").bool_value is True
    assert doc.root.eval("not(//a = 99)").bool_value is True


def test_union_operator():
    doc = parse_xml("<root><a>A</a><b>B</b><c>C</c></root>")
    union = doc.xpath("//a | //c")
    assert len(union) == 2
    assert {e.tag for e in union} == {"a", "c"}


def test_wildcard_all_elements():
    doc = parse_xml(
        "<root><ns1:a xmlns:ns1='http://ns1'>1</ns1:a>"
        "<ns2:b xmlns:ns2='http://ns2'>2</ns2:b></root>"
    )
    assert len(doc.xpath("//*")) >= 2


def test_text_node_selection():
    doc = parse_xml("<root>before<child>inside</child>after</root>")
    r = doc.root.eval("string(/root/text()[1])")
    assert "before" in r.string_value


def test_long_path():
    doc = parse_xml("<root><a><b><c><d><e><f>found</f></e></d></c></b></a></root>")
    assert doc.first_child_xpath("/root/a/b/c/d/e/f").string_value == "found"


def test_quotes_in_predicate_values():
    doc = parse_xml(
        "<root>\n  <item name=\"it's quoted\">value1</item>\n"
        "  <item name='has \"double\" quotes'>value2</item>\n</root>"
    )
    r = doc.first_child_xpath('//item[@name="it\'s quoted"]')
    assert r.string_value == "value1"


def test_arithmetic_eval():
    doc = parse_xml("<root/>")
    assert doc.root.eval("1 + 1").double_value == 2.0
    assert doc.root.eval("1 = 1").bool_value is True


def test_count_eval():
    doc = parse_xml("<root><a/><a/><a/></root>")
    assert doc.root.eval("count(//a)").double_value == 3.0


def test_string_eval():
    doc = parse_xml("<root>Hello World</root>")
    assert doc.root.eval("string(/root/text())").string_value == "Hello World"


# -- Snapshot integrity (ActorHardeningTests.swift:475-592) ------------------


def test_large_item_collection():
    xml = "<root>" + "".join(
        f'<item id="{i}">value{i}</item>' for i in range(1000)
    ) + "</root>"
    doc = parse_xml(xml)
    items = doc.xpath("//item")
    assert len(items) == 1000
    assert len({e.attributes["id"] for e in items}) == 1000


def test_category_predicate_1000():
    # ActorHardeningTests.swift:793-813
    xml = "<root>" + "".join(
        f'<item id="{i}" category="cat{i % 10}"><name>Item {i}</name></item>'
        for i in range(1000)
    ) + "</root>"
    doc = parse_xml(xml)
    assert len(doc.xpath("//item")) == 1000
    assert len(doc.xpath("//item[@category='cat5']")) == 100


def test_attributes_preserved():
    doc = parse_xml(
        '<root attr1="value1" attr2="value2" attr3="value3"'
        ' data-custom="custom-value" xmlns:ns="http://example.com"></root>'
    )
    a = doc.root.attributes
    assert a["attr1"] == "value1"
    assert a["attr2"] == "value2"
    assert a["attr3"] == "value3"
    assert a["data-custom"] == "custom-value"
    assert "xmlns:ns" not in a  # xmlns declarations are not attributes


def test_raw_xml_roundtrip():
    doc = parse_xml('<root><child attr="value">content</child></root>')
    raw = doc.first_child_xpath("//child").raw_xml
    re_doc = parse_xml(raw)
    assert re_doc.root.tag == "child"
    assert re_doc.root.string_value == "content"


def test_raw_xml_simple():
    doc = parse_xml('<?xml version="1.0"?><root><child>text</child></root>')
    assert doc.first_child_xpath("//child").raw_xml == "<child>text</child>"


def test_snapshot_equality():
    doc = parse_xml("<root><child>same</child></root>")
    s1 = doc.first_child_xpath("//child").snapshot()
    s2 = doc.first_child_xpath("//child").snapshot()
    assert s1 == s2
    assert hash(s1) == hash(s2)
    doc2 = parse_xml("<root><a/><b/></root>")
    snaps = {e.snapshot() for e in doc2.xpath("/root/*")}
    assert len(snaps) == 2


# -- Character encodings (ActorHardeningTests.swift:594-679) ----------------


def test_utf8_bom():
    data = b"\xef\xbb\xbf" + b'<?xml version="1.0" encoding="UTF-8"?><root>content</root>'
    doc = parse_xml(data)
    assert doc.root.string_value == "content"


def test_iso_8859_1_declaration():
    doc = parse_xml('<?xml version="1.0" encoding="ISO-8859-1"?><root>Hello</root>')
    assert doc.root.string_value == "Hello"


def test_unicode_ranges():
    doc = parse_xml(
        "<root><latin>café résumé naïve</latin><greek>Ελληνικά</greek>"
        "<cyrillic>Русский</cyrillic><cjk>中文 日本語 한국어</cjk>"
        "<arabic>العربية</arabic><hebrew>עברית</hebrew>"
        "<emoji>🎉🚀💡🌍</emoji><math>∑∏∫√∞</math></root>"
    )
    assert doc.first_child_xpath("//latin").string_value == "café résumé naïve"
    assert doc.first_child_xpath("//cjk").string_value == "中文 日本語 한국어"
    assert doc.first_child_xpath("//emoji").string_value == "🎉🚀💡🌍"


def test_numeric_charrefs():
    doc = parse_xml("<root>&#60;&#62;&#38;&#x3C;&#x3E;</root>")
    assert doc.root.string_value == "<>&<>"


def test_named_entities():
    doc = parse_xml("<root>&lt;&gt;&amp;&quot;&apos;</root>")
    assert doc.root.string_value == "<>&\"'"


def test_mixed_content_with_entities():
    doc = parse_xml("<root>Hello &amp; <b>World</b> &lt;3</root>")
    assert doc.root.string_value == "Hello & World <3"


def test_attribute_entities():
    doc = parse_xml('<root attr="value with &lt;special&gt; &amp; chars"/>')
    assert doc.root.attributes["attr"] == "value with <special> & chars"


def test_mixed_content():
    doc = parse_xml("<root>Hello <b>World</b>!</root>")
    assert doc.root.string_value == "Hello World!"


def test_cdata():
    doc = parse_xml("<root><![CDATA[<not>xml</not>]]></root>")
    assert doc.root.string_value == "<not>xml</not>"


def test_special_chars():
    doc = parse_xml("<root>&lt;tag&gt; &amp; &quot;quotes&quot;</root>")
    assert doc.root.string_value == '<tag> & "quotes"'


def test_long_attribute_value():
    doc = parse_xml('<root attr="' + "x" * 100_000 + '"/>')
    assert len(doc.root.attributes["attr"]) == 100_000


def test_large_text_content():
    content = "Lorem ipsum dolor sit amet. " * 10_000
    doc = parse_xml(f"<root>{content}</root>")
    assert len(doc.root.string_value) == len(content)


# -- Namespace complexity (ActorHardeningTests.swift:682-786) ---------------


def test_default_namespace_needs_prefix():
    doc = parse_xml('<root xmlns="http://default.ns"><child>content</child></root>')
    assert doc.xpath("//child") == []  # unprefixed test ≠ default-ns element
    doc.define_prefix("d", "http://default.ns")
    assert len(doc.xpath("//d:child")) == 1


def test_multiple_prefixes_same_uri():
    doc = parse_xml(
        '<root xmlns:a="http://example.com" xmlns:b="http://example.com">'
        "<a:item>A</a:item><b:item>B</b:item></root>"
    )
    doc.define_prefix("x", "http://example.com")
    assert len(doc.xpath("//x:item")) == 2


def test_namespace_redefinition_in_child():
    doc = parse_xml(
        '<root xmlns:ns="http://outer.ns"><ns:outer>outer content</ns:outer>'
        '<child xmlns:ns="http://inner.ns"><ns:inner>inner content</ns:inner>'
        "</child></root>"
    )
    doc.define_prefix("outer", "http://outer.ns")
    doc.define_prefix("inner", "http://inner.ns")
    assert len(doc.xpath("//outer:outer")) == 1
    assert len(doc.xpath("//inner:inner")) == 1


def test_unbound_prefix_returns_empty():
    doc = parse_xml("<root><child>content</child></root>")
    assert doc.xpath("//undefined:child") == []


def test_unbound_prefix_try_raises():
    doc = parse_xml("<root><child>content</child></root>")
    with pytest.raises(QueryError):
        doc.try_xpath("//undefined:child")


def test_complex_namespace_hierarchy():
    doc = parse_xml(
        '<root xmlns="http://default" xmlns:a="http://a" xmlns:b="http://b">'
        '<a:level1><b:level2 xmlns:c="http://c"><c:level3>deep</c:level3>'
        "</b:level2></a:level1></root>"
    )
    for p, u in (("d", "http://default"), ("a", "http://a"), ("b", "http://b"),
                 ("c", "http://c")):
        doc.define_prefix(p, u)
    assert doc.first_child_xpath("//c:level3").string_value == "deep"


def test_namespaced_attributes():
    doc = parse_xml(
        '<root xmlns:xlink="http://www.w3.org/1999/xlink">'
        '<link xlink:href="http://example.com" xlink:type="simple"/></root>'
    )
    link = doc.first_child_xpath("//link")
    href = link.attributes.get("xlink:href") or link.attributes.get("href")
    assert href == "http://example.com"


def test_declared_prefixes_auto_registered():
    # Queryable.swift:275-285: prefixes declared on the ancestor chain work
    # without define_prefix
    doc = parse_xml(
        '<root xmlns:a="http://a.com" xmlns:b="http://b.com">'
        "<a:item>A</a:item><b:item>B</b:item></root>"
    )
    assert len(doc.xpath("//a:item")) == 1
    assert len(doc.xpath("//b:item")) == 1


# -- HTML-specific edge cases (ActorHardeningTests.swift:867-952) -----------


def test_malformed_html_recovery():
    doc = parse_html("<html><body><div><p>Paragraph<div>Nested")
    assert doc.body is not None


def test_html_entities():
    doc = parse_html("<html><body>&nbsp;&copy;&reg;&trade;</body></html>")
    assert doc.body is not None
    assert doc.body.string_value == "\xa0\xa9\xae™"


def test_script_and_style_content():
    doc = parse_html(
        "<html>\n<head>\n    <style>body { color: red; }</style>\n"
        "    <script>var x = 1 < 2;</script>\n</head>\n<body>Content</body>\n</html>"
    )
    assert doc.body.string_value == "Content"


def test_case_insensitive_tags():
    doc = parse_html("<HTML><BODY><DIV>Content</DIV></BODY></HTML>")
    assert doc.body is not None
    assert doc.body.string_value == "Content"


def test_boolean_attributes():
    doc = parse_html('<html><body><input type="checkbox" checked disabled></body></html>')
    inp = doc.first_child_css("input")
    assert inp is not None
    checked = inp.attributes.get("checked")
    assert checked is not None or "checked" in inp.raw_xml


def test_void_elements():
    doc = parse_html(
        "<html><body>\n    <br>\n    <hr>\n    <img src=\"test.jpg\">\n"
        '    <input type="text">\n    <meta name="test">\n</body></html>'
    )
    assert doc.first_child_css("br") is not None
    assert doc.first_child_css("img").attributes["src"] == "test.jpg"


# -- CSS selector edge cases (ActorHardeningTests.swift:955-1062) -----------


def test_multiclass_via_xpath():
    doc = parse_html(
        '<html><body><div class="a b c">Multiple classes</div>'
        '<div class="a">Single A</div><div class="b">Single B</div></body></html>'
    )
    res = doc.xpath(
        "//*[contains(concat(' ', @class, ' '), ' a ') and"
        " contains(concat(' ', @class, ' '), ' b ')]"
    )
    assert len(res) == 1
    assert res[0].string_value == "Multiple classes"


def test_descendant_vs_child_combinator():
    doc = parse_html(
        "<html><body><div><p>Direct child</p></div>"
        "<div><span><p>Descendant</p></span></div></body></html>"
    )
    assert len(doc.css("div p")) == 2
    children = doc.css("div > p")
    assert len(children) == 1
    assert children[0].string_value == "Direct child"


def test_attribute_selectors():
    doc = parse_html(
        '<html><body><a href="http://example.com">Link 1</a>'
        '<a href="https://secure.com">Link 2</a><a>No href</a></body></html>'
    )
    assert len(doc.css("a[href]")) == 2
    assert len(doc.xpath("//a[@href='http://example.com']")) == 1


def test_complex_combined_selectors():
    doc = parse_html(
        '<html><body><div id="main" class="container"><ul class="list">'
        '<li class="item active">First</li><li class="item">Second</li>'
        "</ul></div></body></html>"
    )
    assert len(doc.css("#main .list .item")) == 2


def test_sibling_combinators():
    doc = parse_html(
        "<html><body><h1>Title</h1><p>First para</p><p>Second para</p>"
        "<div>Not a p</div><p>Third para</p></body></html>"
    )
    adjacent = doc.css("h1 + p")
    assert len(adjacent) == 1
    assert adjacent[0].string_value == "First para"
    assert len(doc.css("h1 ~ p")) == 3


# -- Regression tests (ActorHardeningTests.swift:1065-1124) -----------------


def test_empty_prefix_no_crash():
    doc = parse_xml("<root/>")
    doc.define_prefix("", "http://example.com")
    assert doc.root is not None


def test_nonexistent_query_empty():
    doc = parse_xml("<root/>")
    assert doc.xpath("//nonexistent") == []


def test_consecutive_queries_consistent():
    doc = parse_xml("<root><a/><b/></root>")
    for _ in range(100):
        assert len(doc.xpath("/root/*")) == 2


def test_query_after_prefix_definition():
    doc = parse_xml(
        '<root xmlns:ns="http://example.com"><ns:item>content</ns:item></root>'
    )
    doc.define_prefix("ns", "http://example.com")
    assert len(doc.xpath("//ns:item")) == 1


# -- copy (M1, reference Element.swift:192-194) ------------------------------


def test_copy_subtree_independent():
    from fuzi_rd.doc import parse_html

    d = parse_html(
        b"<html><body><div id='x'><p>one <b>bold</b></p><p>two</p></div>"
        b"<div>other</div></body></html>"
    )
    el = d.css("#x")[0]
    cp = el.copy_subtree()
    assert cp.string_value == el.string_value == "one boldtwo"
    assert cp.attributes == {"id": "x"}
    assert [e.tag for e in cp.xpath(".//p")] == ["p", "p"]
    # independent ownership: mutating the original never affects the copy
    el.children[0].remove()
    assert el.string_value == "two"
    assert cp.string_value == "one boldtwo"


def test_copy_subtree_preserves_namespaces():
    doc = parse_xml('<r xmlns:a="urn:a"><a:c>v</a:c><a:c>w</a:c></r>')
    cp = doc.root.copy_subtree()
    cp.doc.define_prefix("a", "urn:a")
    assert [n.string_value for n in cp.xpath(".//a:c")] == ["v", "w"]


# -- full XPath 1.0 core function library (beyond the reference-pinned set) --


def test_xpath_core_function_library():
    doc = parse_xml("<r><a>hello</a><b id='x7'>world</b><c>3.7</c></r>")
    string_cases = [
        ("substring('hello', 2, 3)", "ell"),
        ("substring('12345', 1.5, 2.6)", "234"),  # spec rounding example
        ("substring-before('a-b', '-')", "a"),
        ("substring-after('a-b', '-')", "b"),
        ("translate('abc-x', 'abcx', 'ABC')", "ABC-"),  # absent -> deleted
        ("concat('x', 'y', 'z')", "xyz"),
        ("local-name(//b)", "b"),
        ("name(//b)", "b"),
    ]
    for expr, want in string_cases:
        assert doc.eval(expr).string_value == want, expr
    number_cases = [
        ("floor(3.7)", 3.0),
        ("ceiling(3.2)", 4.0),
        ("round(3.5)", 4.0),
        ("round(-3.5)", -3.0),  # XPath rounds -3.5 toward +inf
        ("string-length('hello')", 5.0),
        ("number('3.7') + floor(//c)", 6.7),
    ]
    for expr, want in number_cases:
        assert abs(doc.eval(expr).double_value - want) < 1e-9, expr
    assert doc.eval("boolean(//a)").bool_value is True
    assert doc.eval("boolean(//nope)").bool_value is False
    assert doc.eval("true()").bool_value is True
    assert doc.eval("false()").bool_value is False


# -- concurrent reads (reference ActorHardeningTests.swift:155-307) ----------


def test_massive_concurrent_reads_one_document():
    """The fork's headline guarantee: N-way concurrent query access to one
    parsed document returns consistent results (reference: 1000-task stress,
    ActorHardeningTests.swift:157-179).  Our engine's arena is immutable
    during queries, so plain threads replace the serializing actor."""
    import concurrent.futures

    doc = parse_xml(
        "<root>" + "".join(f'<item id="i{i}">v{i}</item>' for i in range(100)) + "</root>"
    )

    def read(i):
        n = i % 100
        hits = doc.xpath(f"//item[@id='i{n}']")
        assert len(hits) == 1 and hits[0].string_value == f"v{n}"
        assert doc.eval("count(//item)").double_value == 100.0
        return True

    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
        assert all(ex.map(read, range(500)))


def test_interleaved_reads_multiple_documents():
    """Reference ActorHardeningTests.swift:280-307: independent documents
    queried concurrently never interfere."""
    import concurrent.futures

    docs = [
        parse_xml(f"<d{k}>" + f"<x>{k}</x>" * (k + 1) + f"</d{k}>")
        for k in range(8)
    ]

    def read(i):
        k = i % 8
        assert len(docs[k].xpath("//x")) == k + 1
        assert docs[k].root.tag == f"d{k}"
        return True

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        assert all(ex.map(read, range(400)))
