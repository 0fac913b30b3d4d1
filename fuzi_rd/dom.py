"""Arena-allocated DOM.

Instead of the reference's pointer-linked object graph (one Swift/C object per
node, /root/reference/Sources/Node.swift:89-164), nodes live in parallel
Python lists indexed by a preorder node id.  This is compact, cheap to free
(drop the lists) and — crucially for the XPath engine — encodes document
order and subtree extent for free:

  * node ids are assigned in document (preorder) order, so sorting a node-set
    is an integer sort;
  * ``subtree_end[i]`` is one past the last descendant of ``i``, so the
    ``descendant`` axis is the contiguous range ``(i, subtree_end[i])``.

The arena exists only transiently inside a Ray ``map_batches`` worker — it is
never serialized into an Arrow block (SURVEY.md §1.2).
"""

from __future__ import annotations

# Node type codes, numerically equal to libxml2's xmlElementType — the FULL
# enum the reference surfaces (reference: Sources/Node.swift:30-73).  The
# parsers emit Element/Text/CDATA/EntityRef/Pi/Comment/Document nodes; the
# remaining codes exist so callers porting reference code that matches on
# any ``XMLNodeType`` case find the same named constants and values.
ELEMENT = 1
ATTRIBUTE = 2
TEXT = 3
CDATA = 4
ENTITY_REF = 5
ENTITY = 6
PI = 7
COMMENT = 8
DOCUMENT = 9
DOCUMENT_TYPE = 10
DOCUMENT_FRAG = 11
NOTATION = 12
HTML_DOCUMENT = 13
DTD = 14
ELEMENT_DECL = 15
ATTRIBUTE_DECL = 16
ENTITY_DECL = 17
NAMESPACE_DECL = 18
XINCLUDE_START = 19
XINCLUDE_END = 20

#: name -> code view of the full enum (Sources/Node.swift:30-73 parity)
NODE_TYPES = {
    "Element": ELEMENT,
    "Attribute": ATTRIBUTE,
    "Text": TEXT,
    "CDataSection": CDATA,
    "EntityRef": ENTITY_REF,
    "Entity": ENTITY,
    "Pi": PI,
    "Comment": COMMENT,
    "Document": DOCUMENT,
    "DocumentType": DOCUMENT_TYPE,
    "DocumentFrag": DOCUMENT_FRAG,
    "Notation": NOTATION,
    "HtmlDocument": HTML_DOCUMENT,
    "DTD": DTD,
    "ElementDecl": ELEMENT_DECL,
    "AttributeDecl": ATTRIBUTE_DECL,
    "EntityDecl": ENTITY_DECL,
    "NamespaceDecl": NAMESPACE_DECL,
    "XIncludeStart": XINCLUDE_START,
    "XIncludeEnd": XINCLUDE_END,
}

_NULL = -1


class Arena:
    """One parsed document.  Node 0 is always the virtual document node."""

    __slots__ = (
        "types",
        "names",  # element tag / PI target; None for text-ish nodes
        "texts",  # text/cdata/comment/PI content; None for elements
        "parents",
        "first_child",
        "last_child",
        "next_sib",
        "prev_sib",
        "subtree_end",
        "lines",
        "attrs",  # per-node dict name->value (local-name keyed) or None
        "attr_order",  # per-node list[(qname, local, value)] or None
        "ns_prefix",  # element namespace prefix or None
        "ns_uri",  # element namespace URI or None
        "nsdefs",  # per-node list[(prefix_or_None, uri)] or None
        "dead",  # mark-dead bitmap (mutation M2); dead nodes keep ids
        "n_dead",
        "root",  # id of the root element, or -1
        "version",
        "encoding",
        "is_html",
        "_finished",
        "_appenders",
    )

    def __init__(self, is_html: bool = False):
        self.types = [0]  # document node sentinel at id 0
        self.names = [None]
        self.texts = [None]
        self.parents = [_NULL]
        self.first_child = [_NULL]
        self.last_child = [_NULL]
        self.next_sib = [_NULL]
        self.prev_sib = [_NULL]
        self.subtree_end = [0]
        self.lines = [0]
        self.attrs = [None]
        self.attr_order = [None]
        self.ns_prefix = [None]
        self.ns_uri = [None]
        self.nsdefs = [None]
        self.dead = [False]
        self.n_dead = 0
        self.root = _NULL
        self.version = None
        self.encoding = None
        self.is_html = is_html
        self._finished = False
        # bound .append methods cached once: add_node is the hottest call in
        # the parse path (one call per DOM node)
        self._appenders = (
            self.types.append,
            self.names.append,
            self.texts.append,
            self.parents.append,
            self.first_child.append,
            self.last_child.append,
            self.next_sib.append,
            self.prev_sib.append,
            self.subtree_end.append,
            self.lines.append,
            self.attrs.append,
            self.attr_order.append,
            self.ns_prefix.append,
            self.ns_uri.append,
            self.nsdefs.append,
            self.dead.append,
        )

    # -- construction (called by the parsers) --------------------------------

    def add_node(
        self,
        node_type: int,
        parent: int,
        name=None,
        text=None,
        line: int = 0,
        attrs=None,
        attr_order=None,
        ns_prefix=None,
        ns_uri=None,
        nsdefs=None,
    ) -> int:
        nid = len(self.types)
        (
            ap_types, ap_names, ap_texts, ap_parents, ap_fc, ap_lc, ap_ns,
            ap_ps, ap_se, ap_lines, ap_attrs, ap_ao, ap_nsp, ap_nsu, ap_nsd,
            ap_dead,
        ) = self._appenders
        ap_types(node_type)
        ap_names(name)
        ap_texts(text)
        ap_parents(parent)
        ap_fc(_NULL)
        ap_lc(_NULL)
        ap_ns(_NULL)
        ap_ps(_NULL)
        ap_se(nid + 1)
        ap_lines(line)
        ap_attrs(attrs)
        ap_ao(attr_order)
        ap_nsp(ns_prefix)
        ap_nsu(ns_uri)
        ap_nsd(nsdefs)
        ap_dead(False)
        # link into the sibling chain
        if parent != _NULL:
            prev = self.last_child[parent]
            if prev == _NULL:
                self.first_child[parent] = nid
            else:
                self.next_sib[prev] = nid
                self.prev_sib[nid] = prev
            self.last_child[parent] = nid
        if self.root == _NULL and node_type == ELEMENT and parent == 0:
            self.root = nid
        return nid

    def append_text(self, parent: int, text: str, line: int = 0) -> int:
        """Append character data, merging with a trailing text-node sibling."""
        last = self.last_child[parent]
        if last != _NULL and self.types[last] == TEXT:
            self.texts[last] += text
            return last
        return self.add_node(TEXT, parent, text=text, line=line)

    def finish(self) -> None:
        """Compute subtree extents; call once after parsing completes."""
        if self._finished:
            return
        # subtree_end[i] = 1 + id of last node in i's subtree.  Since ids are
        # preorder, a node's subtree is contiguous: walk ids backwards and
        # propagate maxima to parents iteratively.
        parents = self.parents
        end = self.subtree_end
        for nid in range(len(parents) - 1, 0, -1):
            p = parents[nid]
            if p >= 0 and end[nid] > end[p]:
                end[p] = end[nid]
        self._finished = True

    # -- traversal helpers ---------------------------------------------------

    def iter_children(self, nid: int):
        c = self.first_child[nid]
        nxt = self.next_sib
        dead = self.dead
        while c != _NULL:
            if not dead[c]:
                yield c
            c = nxt[c]

    def iter_element_children(self, nid: int):
        c = self.first_child[nid]
        nxt = self.next_sib
        types = self.types
        dead = self.dead
        while c != _NULL:
            if types[c] == ELEMENT and not dead[c]:
                yield c
            c = nxt[c]

    def string_value(self, nid: int) -> str:
        """Recursive text content (reference xmlNodeGetContent,
        Sources/Node.swift:126-131): concatenation of all descendant TEXT and
        CDATA content, in document order, entities already resolved by the
        parser.  For text-ish nodes, their own content."""
        t = self.types[nid]
        if t != ELEMENT and t != 0:
            return self.texts[nid] or ""
        if self.n_dead == 0:
            # fast path: contiguous preorder scan
            types = self.types
            texts = self.texts
            out = [
                texts[i]
                for i in range(nid, self.subtree_end[nid])
                if types[i] == TEXT or types[i] == CDATA
            ]
            return "".join(out)
        return self._string_value_walk(nid)

    def _string_value_walk(self, nid: int) -> str:
        """Slow path honoring mark-dead subtrees (iterative, recursion-free)."""
        out = []
        types = self.types
        texts = self.texts
        c = self.first_child[nid]
        nxt = self.next_sib
        fc = self.first_child
        dead = self.dead
        stack = []
        while c != _NULL or stack:
            if c == _NULL:
                c = stack.pop()
                continue
            if not dead[c]:
                t = types[c]
                if t == TEXT or t == CDATA:
                    out.append(texts[c])
                elif t == ELEMENT and fc[c] != _NULL:
                    if nxt[c] != _NULL:
                        stack.append(nxt[c])
                    c = fc[c]
                    continue
            c = nxt[c]
        return "".join(out)

    def line_number(self, nid: int) -> int:
        return self.lines[nid]

    # -- mutation (reference fork additions, Sources/Element.swift:196-216) --

    def remove(self, nid: int) -> None:
        """Mark a subtree dead (the reference unlinks + frees; we keep ids
        stable and let traversal skip dead nodes)."""
        if not self.dead[nid]:
            self.dead[nid] = True
            self.n_dead += 1

    def remove_safely(self, nid: int) -> None:
        """No-op at the root (reference: removeSafely guards parent != nil)."""
        if self.parents[nid] <= 0:
            return
        self.remove(nid)

    def is_effectively_dead(self, nid: int) -> bool:
        """True if the node or any ancestor is marked dead."""
        while nid != _NULL:
            if self.dead[nid]:
                return True
            nid = self.parents[nid]
        return False

    def n_nodes(self) -> int:
        return len(self.types) - 1
