"""Ported golden assertions from the reference's XML-side tests:
Tests/XMLTests.swift, AtomTests.swift, DefaultNamespaceXPathTests.swift,
VMAPTests.swift, XPathFunctionResultTests.swift (literal expected values)."""

import datetime

import pytest

from fuzi_rd import ParseError, QueryError, parse_xml
from tests.conftest import load_fixture


@pytest.fixture(scope="module")
def xml_doc():
    return parse_xml(load_fixture("xml.xml"))


@pytest.fixture()
def atom_doc():
    d = parse_xml(load_fixture("atom.xml"))
    d.define_prefix("atom", "http://www.w3.org/2005/Atom")
    return d


# -- XMLTests.swift ---------------------------------------------------------


def test_xml_version(xml_doc):
    assert xml_doc.version == "1.0"


def test_xml_encoding(xml_doc):
    assert xml_doc.encoding == "UTF-8"


def test_root(xml_doc):
    root = xml_doc.root
    assert root.tag == "spec"
    assert root.attributes["w3c-doctype"] == "rec"
    assert root.attributes["lang"] == "en"


def test_title(xml_doc):
    t = xml_doc.root.first_child_tag("header").first_child_tag("title")
    assert t.tag == "title"
    assert t.string_value == "Extensible Markup Language (XML)"


def test_xpath(xml_doc):
    elts = xml_doc.xpath("/spec/header/title")
    assert [e.tag for e in elts] == ["title"]


def test_try_xpath_throws_1207(xml_doc):
    with pytest.raises(QueryError) as e:
        xml_doc.try_xpath("////")
    assert e.value.code == 1207
    assert e.value.message == "Invalid expression"


def test_try_xpath_unknown_function_1209(xml_doc):
    with pytest.raises(QueryError) as e:
        xml_doc.try_xpath("//*[unknown()]")
    assert e.value.code == 1209
    assert e.value.message == "Unregistered function"


def test_line_number(xml_doc):
    header = xml_doc.root.first_child_tag("header")
    assert header.line_number == 120


def test_empty_input_throws():
    with pytest.raises(ParseError):
        parse_xml(b"")


def test_authors_by_tag(xml_doc):
    authlist = xml_doc.root.first_child_tag("header").first_child_tag("authlist")
    assert len(authlist.children_tag("author")) == 5


# -- AtomTests.swift --------------------------------------------------------


def test_atom_root(atom_doc):
    assert atom_doc.root.tag == "feed"
    assert atom_doc.version == "1.0"
    assert atom_doc.encoding == "UTF-8"


def test_atom_title_nav(atom_doc):
    t = atom_doc.root.first_child_tag("title")
    assert t.string_value == "Example Feed"


def test_atom_title_xpath(atom_doc):
    t = atom_doc.first_child_xpath("/atom:feed/atom:title")
    assert t is not None
    assert t.tag == "title"
    assert t.string_value == "Example Feed"


def test_atom_links(atom_doc):
    links = atom_doc.root.children_tag("link")
    assert len(links) == 2
    assert links[0].string_value == ""
    assert links[0]["href"] != links[1]["href"]


def test_atom_updated_date(atom_doc):
    d = atom_doc.root.first_child_tag("updated").date_value
    assert d == datetime.datetime(
        2003, 12, 13, 18, 30, 2, tzinfo=datetime.timezone.utc
    )


def test_atom_entries(atom_doc):
    assert len(atom_doc.root.children_tag("entry")) == 1


def test_full_node_type_enum_surface():
    """The full libxml2 xmlElementType enum is surfaced with the reference's
    case names and numeric values (reference Sources/Node.swift:30-73)."""
    from fuzi_rd import dom

    assert len(dom.NODE_TYPES) == 20
    assert dom.NODE_TYPES["Element"] == 1
    assert dom.NODE_TYPES["Comment"] == 8
    assert dom.NODE_TYPES["HtmlDocument"] == 13
    assert dom.NODE_TYPES["XIncludeEnd"] == 20
    assert list(dom.NODE_TYPES.values()) == list(range(1, 21))


def test_formatter_injection():
    """Callers can swap the number/date formatters, at parse time or later
    (reference Document.swift:50-62: ``numberFormatter``/``dateFormatter``
    are settable vars read by the typed-value getters)."""
    from fuzi_rd.doc import parse_xml

    xml = "<r><n>1.234,5</n><d>13/12/2003 18:30</d></r>"
    doc = parse_xml(xml)
    # defaults: European decimal comma and d/m/y are not parseable
    assert doc.root.first_child_tag("n").number_value is None
    assert doc.root.first_child_tag("d").date_value is None

    def de_number(s):
        try:
            return float(s.strip().replace(".", "").replace(",", "."))
        except ValueError:
            return None

    def dmy_date(s):
        try:
            return datetime.datetime.strptime(s.strip(), "%d/%m/%Y %H:%M")
        except ValueError:
            return None

    doc2 = parse_xml(xml, number_parser=de_number, date_parser=dmy_date)
    assert doc2.root.first_child_tag("n").number_value == 1234.5
    assert doc2.root.first_child_tag("d").date_value == datetime.datetime(
        2003, 12, 13, 18, 30
    )
    # runtime swap on an existing document (var semantics)
    doc.number_parser = de_number
    assert doc.root.first_child_tag("n").number_value == 1234.5
    # a deep copy inherits the injected formatters (independent ownership,
    # same configuration — reference copy() keeps document formatters)
    copied = doc2.root.first_child_tag("n").copy_subtree()
    assert copied.number_value == 1234.5


def test_atom_namespace(atom_doc):
    entry = atom_doc.root.children_tag("entry")[0]
    namespaced = entry.children_tag("language", in_namespace="dc")
    assert len(namespaced) == 1
    assert namespaced[0].namespace == "dc"


def test_atom_first_child_in_namespace(atom_doc):
    entry = atom_doc.root.first_child_tag("entry")
    el = entry.first_child_tag("language", in_namespace="dc")
    assert el.namespace == "dc"
    assert el.string_value == "en-us"


def test_atom_xpath_with_namespaces(atom_doc):
    els = atom_doc.xpath("//dc:language")
    assert len(els) == 1
    assert els[0].namespace == "dc"


def test_atom_namespace_aliases(atom_doc):
    atom_doc.define_prefix("atom-alias", "http://www.w3.org/2005/Atom")
    atom_doc.define_prefix("dc-alias", "http://purl.org/dc/elements/1.1/")
    results = atom_doc.xpath("//atom-alias:entry/dc-alias:language")
    assert [e.raw_xml for e in results] == ["<dc:language>en-us</dc:language>"]
    assert results[0].namespace == "dc"
    results = atom_doc.xpath("//atom:entry/dc:language")
    assert [e.raw_xml for e in results] == ["<dc:language>en-us</dc:language>"]


# -- DefaultNamespaceXPathTests.swift ---------------------------------------


@pytest.fixture()
def ocf_doc():
    d = parse_xml(load_fixture("ocf.xml"))
    d.define_prefix("ocf", "urn:oasis:names:tc:opendocument:xmlns:container")
    return d


def test_absolute_xpath_default_namespace(ocf_doc):
    els = ocf_doc.xpath("/ocf:container/ocf:rootfiles/ocf:rootfile")
    assert [e.tag for e in els] == ["rootfile"]


def test_relative_xpath_default_namespace(ocf_doc):
    count = 0
    for abs_el in ocf_doc.xpath("/ocf:container/ocf:rootfiles"):
        for rel_el in abs_el.xpath("./ocf:rootfile"):
            assert rel_el.tag == "rootfile"
            count += 1
    assert count == 1


def test_default_namespace_in_child_node(ocf_doc):
    ocf_doc.define_prefix("dc", "http://purl.org/dc/elements/1.1/")
    results = ocf_doc.xpath("/ocf:container/dc:metadata/dc:identifier")
    assert [e.raw_xml for e in results] == [
        '<identifier id="pub-id">urn:uuid:pubid</identifier>'
    ]
    assert results[0].namespace is None


# -- VMAPTests.swift --------------------------------------------------------


@pytest.fixture()
def vmap_doc():
    return parse_xml(load_fixture("vmap.xml"))


def test_vmap_absolute_xpath(vmap_doc):
    els = vmap_doc.xpath("/vmap:VMAP/vmap:Extensions/uo:unicornOnce")
    assert [e.tag for e in els] == ["unicornOnce"]


def test_vmap_relative_xpath(vmap_doc):
    count = 0
    for abs_el in vmap_doc.xpath("/vmap:VMAP/vmap:Extensions"):
        for rel_el in abs_el.xpath("./uo:unicornOnce"):
            assert rel_el.tag == "unicornOnce"
            count += 1
    assert count == 1


def test_vmap_unicorn_is_blank(vmap_doc):
    el = vmap_doc.first_child_xpath("/vmap:VMAP/vmap:Extensions/uo:unicornOnce")
    assert el is not None
    assert el.is_blank


# -- XPathFunctionResultTests.swift -----------------------------------------


def test_function_result_bool(atom_doc):
    assert atom_doc.root.eval("starts-with('Ono','O')").bool_value is True


def test_function_result_double(atom_doc):
    assert atom_doc.root.eval("count(./atom:link)").double_value == 2


def test_function_result_string(atom_doc):
    r = atom_doc.root.eval("string(./atom:entry[1]/dc:language[1]/text())")
    assert r.string_value == "en-us"


def test_multiple_roots_first_wins():
    # libxml2 keeps only the first root (reference ActorTests.swift:835-849)
    doc = parse_xml("<root1/><root2/>")
    assert doc.root.tag == "root1"


def test_very_long_attribute_value():
    # reference ActorTests.swift:860-868
    doc = parse_xml('<root attr="' + "x" * 10000 + '"/>')
    assert len(doc.root.attributes["attr"]) == 10000
