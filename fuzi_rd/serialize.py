"""Subtree re-serialization (the reference's ``rawXML``).

Reference: /root/reference/Sources/Node.swift:134-144 — ``xmlNodeDump`` for
XML documents, ``htmlNodeDump`` for HTML.  Byte-level goldens from the
reference tests:

  <child>text</child>                                   (ActorTests.swift:461-468)
  <dc:language>en-us</dc:language>                      (AtomTests.swift:130-134)
  <identifier id="pub-id">urn:uuid:pubid</identifier>   (DefaultNamespaceXPathTests.swift:66)

Rules replicated from libxml2's dump:
  * namespace declarations are emitted only on the element that declares them
    (so a subtree dump of an element whose ns was declared on an ancestor has
    no xmlns attribute — exactly the goldens above);
  * attributes double-quoted; `&<>"` escaped in attribute values, `&<>` in text;
  * childless XML elements serialize as ``<tag/>``;
  * HTML: void elements have no close tag; empty non-void elements get an
    explicit close tag; boolean attributes emit just the name;
    script/style text is not escaped.
"""

from __future__ import annotations

from fuzi_rd.dom import CDATA, COMMENT, ELEMENT, PI, TEXT, Arena
from fuzi_rd.html_parser import VOID_ELEMENTS

_NULL = -1

_TEXT_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_ATTR_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "\n": "&#10;"}


def _esc_text(s: str) -> str:
    if "&" in s or "<" in s or ">" in s:
        for ch, rep in _TEXT_ESC.items():
            s = s.replace(ch, rep)
    return s


def _esc_attr(s: str) -> str:
    for ch in "&<>\"\n":
        if ch in s:
            for c, rep in _ATTR_ESC.items():
                s = s.replace(c, rep)
            break
    return s


def _qname(arena: Arena, nid: int) -> str:
    prefix = arena.ns_prefix[nid]
    name = arena.names[nid]
    return f"{prefix}:{name}" if prefix else name


def raw_xml(arena: Arena, nid: int) -> str:
    """Serialize one subtree, honoring mark-dead nodes (skipped)."""
    out = []
    _dump(arena, nid, out, arena.is_html)
    return "".join(out)


def _open_tag(arena: Arena, nid: int, out: list, html: bool) -> None:
    out.append("<")
    out.append(_qname(arena, nid))
    nsdefs = arena.nsdefs[nid]
    if nsdefs:
        for prefix, uri in nsdefs:
            if prefix:
                out.append(f' xmlns:{prefix}="{_esc_attr(uri)}"')
            else:
                out.append(f' xmlns="{_esc_attr(uri)}"')
    attr_order = arena.attr_order[nid]
    if attr_order:
        for qname, _local, value in attr_order:
            if html and value == "":
                out.append(f" {qname}")
            else:
                out.append(f' {qname}="{_esc_attr(value)}"')


def _dump(arena: Arena, top: int, out: list, html: bool) -> None:
    # iterative pre/post-order walk with an explicit stack (no recursion:
    # reference corpus includes 1000-deep nesting)
    stack = [(top, False)]
    types = arena.types
    texts = arena.texts
    dead = arena.dead
    fc = arena.first_child
    ns = arena.next_sib
    while stack:
        nid, closing = stack.pop()
        if closing:
            out.append(f"</{_qname(arena, nid)}>")
            continue
        if dead[nid]:
            continue
        t = types[nid]
        if t == ELEMENT:
            _open_tag(arena, nid, out, html)
            child = fc[nid]
            name = arena.names[nid]
            if html:
                if name in VOID_ELEMENTS:
                    out.append(">")
                    continue
                out.append(">")
                stack.append((nid, True))
            else:
                if child == _NULL:
                    out.append("/>")
                    continue
                out.append(">")
                stack.append((nid, True))
            # push children in reverse so they pop in document order
            children = []
            while child != _NULL:
                children.append(child)
                child = ns[child]
            for c in reversed(children):
                stack.append((c, False))
        elif t == TEXT:
            parent = arena.parents[nid]
            if html and arena.names[parent] in ("script", "style"):
                out.append(texts[nid])
            else:
                out.append(_esc_text(texts[nid]))
        elif t == CDATA:
            out.append(f"<![CDATA[{texts[nid]}]]>")
        elif t == COMMENT:
            out.append(f"<!--{texts[nid]}-->")
        elif t == PI:
            data = texts[nid]
            if arena.is_html:
                out.append(f"<?{data}>")
            else:
                out.append(f"<?{arena.names[nid]} {data}?>")
