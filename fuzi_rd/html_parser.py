"""Tag-soup-tolerant HTML parser -> arena DOM.

The reference parses HTML with libxml2's ``htmlReadMemory`` under
``RECOVER|NOERROR|NOWARNING`` (reference:
/root/reference/Sources/Document.swift:211-213).  This module reimplements
the observable behavior the reference test-suite pins down
(Tests/HTMLTests.swift, Tests/ActorHardeningTests.swift:869-952):

  * case-normalized tag/attribute names (lowercase)
  * void elements (``<br>``, ``<img …>``) never take children
  * boolean attributes (``checked``) recorded with empty value
  * missing close tags recovered via implied end-tags (``<p>`` closed by
    block elements, ``<li>`` by ``<li>``, …)
  * implicit ``html``/``head``/``body`` synthesis; head-only elements
    (``title``, ``meta``, ``link``, ``base``) placed in head until body
    content starts
  * ``script``/``style`` content kept as raw text (no entity decoding)
  * entities/charrefs decoded everywhere else (full HTML5 named set)
  * whitespace text nodes preserved inside head/body (the reference counts
    them: Tests/HTMLTests.swift:113-120)

The tokenizer is the one-shot scanner in ``fuzi_rd.html_tokenizer`` (~2x the
stdlib ``html.parser`` throughput); this module owns all tree construction.
"""

from __future__ import annotations

from fuzi_rd.dom import COMMENT, ELEMENT, PI, TEXT, Arena
from fuzi_rd.errors import ParseError

_NULL = -1

VOID_ELEMENTS = frozenset(
    "area base basefont br col embed frame hr img input isindex keygen link"
    " meta param source track wbr".split()
)

# Elements whose presence in head is expected before body starts.
_HEAD_ONLY = frozenset("title base link meta isindex".split())
_HEAD_OK = _HEAD_ONLY | frozenset(("script", "style", "noscript", "template"))

# Implied end-tags: starting <key> auto-closes an open <value …> ancestor-chain
# element if it is the nearest open element of that set.
_BLOCK = frozenset(
    "address article aside blockquote center details dialog dir div dl"
    " fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup"
    " hr listing main menu nav ol p plaintext pre section summary table ul"
    " xmp li dt dd".split()
)
_AUTOCLOSE = {
    "li": frozenset(("li",)),
    "dt": frozenset(("dt", "dd")),
    "dd": frozenset(("dt", "dd")),
    "tr": frozenset(("tr", "td", "th")),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "thead": frozenset(("thead", "tbody", "tfoot")),
    "tbody": frozenset(("thead", "tbody", "tfoot")),
    "tfoot": frozenset(("thead", "tbody", "tfoot")),
    "option": frozenset(("option",)),
    "optgroup": frozenset(("option", "optgroup")),
    "a": frozenset(("a",)),
    "p": frozenset(("p",)),
}
for _t in _BLOCK:
    _AUTOCLOSE.setdefault(_t, frozenset())
_AUTOCLOSE = {
    t: (s | frozenset(("p",)) if t in _BLOCK else s) for t, s in _AUTOCLOSE.items()
}


class _HTMLBuilder:
    """Tree builder; driven by fuzi_rd.html_tokenizer.tokenize (which
    decodes entities and lowercases names before calling in)."""

    def __init__(self, track_lines: bool = True):
        self.track_lines = track_lines
        self.cur_line = 1
        self.arena = Arena(is_html=True)
        self.stack = [0]  # node ids; document node at bottom
        self.tags = [None]  # parallel tag-name stack
        self.html_id = _NULL
        self.head_id = _NULL
        self.body_id = _NULL
        self.body_started = False
        self.head_closed = False

    # -- structure synthesis -------------------------------------------------

    def _open(self, tag, attrs_pairs, line):
        arena = self.arena
        attrs = {}
        attr_order = []
        for name, value in attrs_pairs:
            v = "" if value is None else value
            if name not in attrs:
                attrs[name] = v
                attr_order.append((name, name, v))
        nid = arena.add_node(
            ELEMENT,
            self.stack[-1],
            name=tag,
            line=line,
            attrs=attrs,
            attr_order=attr_order,
        )
        self.stack.append(nid)
        self.tags.append(tag)
        return nid

    def _close_top(self):
        self.stack.pop()
        self.tags.pop()

    def _ensure_html(self, line):
        if self.html_id == _NULL:
            self.html_id = self._open("html", (), line)

    def _ensure_head(self, line):
        self._ensure_html(line)
        if self.head_id == _NULL and not self.body_started:
            # open implicit head under html
            save_point = len(self.stack)
            # head always goes directly under html
            while self.tags[-1] != "html":
                self._close_top()
            self.head_id = self._open("head", (), line)

    def _close_head(self):
        if self.head_id != _NULL and not self.head_closed:
            while len(self.stack) > 1 and self.tags[-1] != "head":
                self._close_top()
            if self.tags[-1] == "head":
                self._close_top()
        self.head_closed = True

    def _ensure_body(self, line):
        self._ensure_html(line)
        if not self.body_started:
            self._close_head()
            while self.tags[-1] != "html":
                self._close_top()
            self.body_id = self._open("body", (), line)
            self.body_started = True

    # -- token handlers ------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        line = self.cur_line
        if tag == "html":
            if self.html_id == _NULL:
                self.html_id = self._open("html", attrs, line)
            return
        if tag == "head":
            self._ensure_html(line)
            if self.head_id == _NULL and not self.body_started:
                while self.tags[-1] != "html":
                    self._close_top()
                self.head_id = self._open("head", attrs, line)
            return
        if tag == "body":
            self._ensure_html(line)
            if not self.body_started:
                self._close_head()
                while self.tags[-1] != "html":
                    self._close_top()
                self.body_id = self._open("body", attrs, line)
                self.body_started = True
            return
        if not self.body_started and (tag in _HEAD_OK) and self.body_id == _NULL:
            self._ensure_head(line)
        elif tag not in _HEAD_OK:
            self._ensure_body(line)
        elif self.body_started:
            pass  # script/style/meta inside body stay where they are
        # implied end tags
        closers = _AUTOCLOSE.get(tag)
        if closers:
            # close the nearest open element in the closer set, if any,
            # without crossing a scoping boundary
            for depth in range(len(self.tags) - 1, 0, -1):
                t = self.tags[depth]
                if t in closers:
                    while len(self.tags) > depth:
                        self._close_top()
                    break
                if t in ("html", "head", "body", "table", "template") or (
                    tag in ("td", "th", "tr") and t in ("thead", "tbody", "tfoot")
                ):
                    break
                # list-item scope: a new <li> must not close through a
                # nested list container (HTML5 "list item scope"; same for
                # dt/dd within dl) — else nested lists flatten
                if tag == "li" and t in ("ul", "ol"):
                    break
                if tag in ("dt", "dd") and t == "dl":
                    break
        nid = self._open(tag, attrs, line)
        if tag in VOID_ELEMENTS:
            self._close_top()

    def handle_startendtag(self, tag, attrs):
        # <tag/> — treat like a start tag that immediately closes (non-void
        # XHTML-style self-closing)
        self.handle_starttag(tag, attrs)
        if tag not in VOID_ELEMENTS and self.tags[-1] == tag:
            self._close_top()

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        if tag == "html" or tag == "body":
            # defer: remaining close-out happens at finish()
            if tag == "body" and self.body_started:
                while len(self.tags) > 1 and self.tags[-1] != "body":
                    self._close_top()
                if self.tags[-1] == "body":
                    self._close_top()
            return
        if tag == "head":
            self._close_head()
            return
        # pop to the matching open tag if present
        for depth in range(len(self.tags) - 1, 0, -1):
            if self.tags[depth] == tag:
                while len(self.tags) > depth:
                    self._close_top()
                return
        # no matching open tag: ignore stray end tag (libxml2 behavior)

    def handle_data(self, data):
        top = self.tags[-1]
        if top is None or top == "html":
            # text at document/html level: whitespace is dropped, real text
            # forces an implicit body
            if data.strip() == "":
                return
            self._ensure_body(self.cur_line)
        self.arena.append_text(self.stack[-1], data)

    def handle_comment(self, data):
        self.arena.add_node(COMMENT, self.stack[-1], text=data)

    def handle_decl(self, decl):
        pass  # doctype: no node (root children golden counts exclude it)

    def handle_pi(self, data):
        self.arena.add_node(PI, self.stack[-1], name="pi", text=data)

    def unknown_decl(self, data):
        pass

    def finish(self):
        while len(self.stack) > 1:
            self._close_top()
        self.arena.finish()


def parse_html_bytes(data, encoding: str | None = None,
                     track_lines: bool = True) -> Arena:
    """Parse HTML bytes (or str) into an arena DOM.

    ``track_lines=False`` skips source-line bookkeeping (the extraction
    stage emits no line numbers; parity mode keeps the default)."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        raw = bytes(data)
        if not raw:
            raise ParseError("parserFailure: empty input")
        text, declared = _decode_html(raw, encoding)
    else:
        text = data
        declared = "UTF-8"
        if not text:
            raise ParseError("parserFailure: empty input")
    from fuzi_rd.html_tokenizer import tokenize

    builder = _HTMLBuilder(track_lines=track_lines)
    try:
        tokenize(text, builder)
    except Exception:
        # recovery: keep partial tree (libxml2 RECOVER semantics)
        pass
    builder.finish()
    arena = builder.arena
    if arena.root == _NULL:
        raise ParseError("parserFailure: no root element")
    arena.encoding = declared
    return arena


def _sniff_charset(raw: bytes) -> str | None:
    """meta-charset sniff over the first 2048 bytes (shared with the
    batched fast path in fuzi_rd/chtml.py, which must replicate
    _decode_html byte-for-byte)."""
    head = raw[:2048].lower()
    idx = head.find(b"charset=")
    if idx == -1:
        return None
    end = idx + 8
    if head[end : end + 1] in (b'"', b"'"):
        end += 1
    stop = end
    while stop < len(head) and head[stop : stop + 1] not in (
        b'"',
        b"'",
        b">",
        b" ",
        b"/",
        b";",
    ):
        stop += 1
    try:
        return head[end:stop].decode("ascii")
    except UnicodeDecodeError:
        return None


def _decode_html(raw: bytes, encoding: str | None):
    """BOM / meta-charset sniff with UTF-8 fallback (reference falls back to
    UTF-8 too, Document.swift:34-42)."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8", "replace"), "UTF-8"
    if raw.startswith(b"\xff\xfe"):
        return raw.decode("utf-16-le", "replace"), "UTF-16"
    if raw.startswith(b"\xfe\xff"):
        return raw.decode("utf-16-be", "replace"), "UTF-16"
    enc = encoding
    if enc is None:
        enc = _sniff_charset(raw)
    if enc:
        try:
            return raw.decode(enc, "replace"), enc.upper()
        except LookupError:
            pass
    return raw.decode("utf-8", "replace"), "UTF-8"
