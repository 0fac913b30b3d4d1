"""Recovering XML parser -> arena DOM.

The reference parses with ``xmlReadMemory`` under
``RECOVER|NOERROR|NOWARNING`` — error-tolerant, non-strict (reference:
/root/reference/Sources/Document.swift:125-140).  We drive the stdlib expat
parser (C speed) and replicate the recovery semantics the reference
test-suite actually pins down (Tests/ActorHardeningTests.swift:31-128):

  * well-formed input        -> full tree
  * truncated / mismatched tags / junk after root / NUL bytes / bad UTF-8
                             -> partial tree up to the error (root kept)
  * empty input / no element -> ParseError (reference: parserFailure)

Internal-subset entities (e.g. xml.xml's ``&versionOfXML;``) are expanded by
expat, including entities containing element markup; external DTDs are never
fetched.  Namespace *declarations* are tracked manually (``xmlns[:p]``
attributes are recorded as nsdefs, excluded from the attribute dict — the
reference excludes them too, Sources/Element.swift:40-50) so the XPath
engine can replicate libxml2's ancestor-chain prefix registration
(Sources/Queryable.swift:275-285).
"""

from __future__ import annotations

import xml.parsers.expat as _expat

from fuzi_rd.dom import CDATA, COMMENT, ELEMENT, PI, TEXT, Arena
from fuzi_rd.errors import ParseError

_NULL = -1


class _Builder:
    __slots__ = (
        "arena",
        "stack",
        "parser",
        "in_cdata",
        "ns_scopes",
    )

    def __init__(self):
        self.arena = Arena(is_html=False)
        self.stack = [0]  # node-id stack; document node at bottom
        self.in_cdata = False
        # namespace scope: list of dicts prefix->uri, innermost last
        self.ns_scopes = [{None: None, "xml": "http://www.w3.org/XML/1998/namespace"}]
        p = _expat.ParserCreate()  # no namespace separator: raw qnames
        p.buffer_text = True
        p.ordered_attributes = True
        p.StartElementHandler = self._start
        p.EndElementHandler = self._end
        p.CharacterDataHandler = self._chars
        p.CommentHandler = self._comment
        p.ProcessingInstructionHandler = self._pi
        p.StartCdataSectionHandler = self._cdata_start
        p.EndCdataSectionHandler = self._cdata_end
        p.XmlDeclHandler = self._xml_decl
        self.parser = p

    def _lookup(self, prefix):
        for scope in reversed(self.ns_scopes):
            if prefix in scope:
                return scope[prefix]
        return None

    def _xml_decl(self, version, encoding, standalone):
        self.arena.version = version
        self.arena.encoding = encoding

    def _start(self, name, attr_list):
        arena = self.arena
        nsdefs = None
        scope = None
        # attr_list is [name0, value0, name1, value1, ...] (ordered_attributes)
        attrs = {}
        attr_order = []
        pending = []
        for i in range(0, len(attr_list), 2):
            aname = attr_list[i]
            aval = attr_list[i + 1]
            if aname == "xmlns":
                if scope is None:
                    scope = {}
                scope[None] = aval or None
                if nsdefs is None:
                    nsdefs = []
                nsdefs.append((None, aval))
            elif aname.startswith("xmlns:"):
                prefix = aname[6:]
                if scope is None:
                    scope = {}
                scope[prefix] = aval
                if nsdefs is None:
                    nsdefs = []
                nsdefs.append((prefix, aval))
            else:
                pending.append((aname, aval))
        if scope is not None:
            self.ns_scopes.append(scope)
        else:
            self.ns_scopes.append({})  # keep depth aligned with elements
        # resolve element qname
        if ":" in name:
            eprefix, local = name.split(":", 1)
            euri = self._lookup(eprefix)
        else:
            eprefix, local = None, name
            euri = self._lookup(None)
        # attributes: keyed by local name (reference keys by properties name,
        # Sources/Element.swift:40-50; prefix tracked via qname in attr_order)
        for aname, aval in pending:
            alocal = aname.rsplit(":", 1)[-1] if ":" in aname else aname
            attrs[alocal] = aval
            attr_order.append((aname, alocal, aval))
        nid = arena.add_node(
            ELEMENT,
            self.stack[-1],
            name=local,
            line=self.parser.CurrentLineNumber,
            attrs=attrs,
            attr_order=attr_order,
            ns_prefix=eprefix,
            ns_uri=euri,
            nsdefs=nsdefs,
        )
        self.stack.append(nid)

    def _end(self, name):
        if len(self.stack) > 1:
            self.stack.pop()
            self.ns_scopes.pop()

    def _chars(self, data):
        if len(self.stack) == 1:
            # character data outside the root element: whitespace between the
            # declaration/DTD and root; drop (libxml2 does too)
            if data.strip() == "":
                return
        if self.in_cdata:
            self.arena.add_node(CDATA, self.stack[-1], text=data)
        else:
            self.arena.append_text(self.stack[-1], data)

    def _comment(self, data):
        self.arena.add_node(COMMENT, self.stack[-1], text=data)

    def _pi(self, target, data):
        self.arena.add_node(PI, self.stack[-1], name=target, text=data)

    def _cdata_start(self):
        self.in_cdata = True

    def _cdata_end(self):
        self.in_cdata = False


def parse_xml_bytes(data: bytes) -> Arena:
    """Parse XML bytes into an arena, with libxml2-RECOVER-like tolerance."""
    if isinstance(data, str):
        data = data.encode("utf-8", "replace")
    builder = _Builder()
    try:
        builder.parser.Parse(data, True)
    except _expat.ExpatError:
        # Recovery mode: keep whatever tree was built before the error
        # (mirrors XML_PARSE_RECOVER, reference Document.swift:126).  A tree
        # with no root element is a real parse failure.
        pass
    arena = builder.arena
    if arena.root == _NULL:
        raise ParseError("parserFailure: no root element")
    arena.finish()
    return arena
