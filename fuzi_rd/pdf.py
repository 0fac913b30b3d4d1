"""Minimal, dependency-free PDF text extractor.

The north-star pipeline names "PDF/layout parse" next to HTML boilerplate
strip as an extraction-tier stage.  No PDF library ships in this
environment, and none is needed for the text path: PDF content streams are
a small postfix language and FlateDecode is stdlib ``zlib``.  This module
implements the honest subset a crawl pipeline meets most often:

  - object scan directly over the raw bytes (``N G obj .. endobj``), which
    survives the broken/absent xref tables that are endemic in crawled
    PDFs — the xref is never consulted;
  - dictionaries/arrays/names/numbers/strings/refs parsed with a tiny
    recursive-descent reader;
  - ``/FlateDecode`` content streams inflated with zlib (raw-deflate
    fallback); other filters (DCTDecode images etc.) are skipped —
    they carry no text;
  - page order from the catalog's ``/Pages`` tree when resolvable, file
    order of ``/Type /Page`` objects otherwise;
  - text operators ``BT ET Tj ' " TJ Td TD T* Tm`` with deterministic
    layout rules (below); literal strings with the full escape table and
    hex strings; UTF-16BE (BOM) / UTF-8 / Latin-1 decode heuristic.

Layout rules (fixed, deterministic — the synthetic writer in
sources/pdfs.py round-trips byte-identically through them):

  - a vertical move (``Td``/``TD`` with ty != 0, ``T*``, a ``Tm`` that
    changes y, or the ``'``/``"`` operators) starts a new line;
  - a pure horizontal move (``Td`` with ty == 0) inserts one space;
  - inside ``TJ`` arrays a kern adjustment below -180/1000 em inserts a
    space (the common word-gap heuristic);
  - pages join with a single newline between them.

Out of scope, by design (documented limits, not bugs): ToUnicode CMaps /
composite fonts (bytes are decoded with the heuristic above), encrypted
documents (reported as ``PdfError``), object streams (``/Type /ObjStm``,
compressed xref — rare in the wild corpus this targets and absent from the
synthetic one).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

__all__ = ["PdfError", "PdfPage", "PdfDocument", "parse_pdf", "pdf_text"]


class PdfError(Exception):
    """Raised when the input is not parseable as PDF at all."""


# ---------------------------------------------------------------------------
# low-level object reader


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Ref({self.num})"


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Reader:
    """Recursive-descent reader for PDF objects over a bytes buffer."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = buf[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and buf[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def read_object(self):
        self._skip_ws()
        buf = self.buf
        if self.pos >= len(buf):
            raise PdfError("unexpected end of data")
        c = buf[self.pos]
        if c == 0x3C:  # '<'
            if buf[self.pos + 1 : self.pos + 2] == b"<":
                return self._read_dict()
            return self._read_hex_string()
        if c == 0x28:  # '('
            return self._read_literal_string()
        if c == 0x2F:  # '/'
            return self._read_name()
        if c == 0x5B:  # '['
            return self._read_array()
        if c in b"+-.0123456789":
            return self._read_number_or_ref()
        word = self._read_word()
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        raise PdfError(f"unexpected token {word!r} at {self.pos}")

    def _read_word(self) -> bytes:
        start = self.pos
        buf, n = self.buf, len(self.buf)
        while self.pos < n and buf[self.pos] not in _WS and buf[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            self.pos += 1  # never stall
        return buf[start : self.pos]

    def _read_name(self) -> str:
        self.pos += 1  # '/'
        start = self.pos
        buf, n = self.buf, len(self.buf)
        out = bytearray()
        while self.pos < n:
            c = buf[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#xx' escape
                hexpair = buf[self.pos + 1 : self.pos + 3]
                try:
                    out += bytes.fromhex(hexpair.decode("ascii", "replace"))
                    self.pos += 3
                except ValueError:  # '#' not followed by 2 hex digits: literal
                    out.append(c)
                    self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        del start
        return out.decode("latin-1")

    def _read_number_or_ref(self):
        start = self.pos
        buf = self.buf
        word = self._read_word()
        try:
            if b"." in word:
                return float(word)
            num = int(word)
        except ValueError:
            raise PdfError(f"bad number {word!r}")
        # lookahead for "G R" (indirect reference)
        save = self.pos
        self._skip_ws()
        m = re.match(rb"(\d+)\s+R(?![a-zA-Z])", buf[self.pos : self.pos + 24])
        if num >= 0 and b"." not in word and m:
            self.pos += m.end()
            return _Ref(num)
        self.pos = save
        del start
        return num

    def _read_literal_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        self.pos += 1  # '('
        depth = 1
        out = bytearray()
        while self.pos < n:
            c = buf[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = buf[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":  # up to 3 octal digits
                    digits = bytearray()
                    while len(digits) < 3 and self.pos < n and buf[self.pos] in b"01234567":
                        digits.append(buf[self.pos])
                        self.pos += 1
                    out.append(int(digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and buf[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated literal string")

    def _read_hex_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        self.pos += 1  # '<'
        digits = bytearray()
        while self.pos < n and buf[self.pos] != 0x3E:
            c = buf[self.pos]
            if c in b"0123456789abcdefABCDEF":
                digits.append(c)
            self.pos += 1
        self.pos += 1  # '>'
        if len(digits) % 2:
            digits.append(0x30)  # odd count: pad with 0
        return bytes.fromhex(digits.decode("ascii"))

    def _read_array(self) -> list:
        self.pos += 1  # '['
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.buf):
                raise PdfError("unterminated array")
            if self.buf[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.read_object())

    def _read_dict(self) -> dict:
        self.pos += 2  # '<<'
        out = {}
        while True:
            self._skip_ws()
            if self.buf[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            if self.pos >= len(self.buf):
                raise PdfError("unterminated dict")
            key = self.read_object()
            if not isinstance(key, str):
                raise PdfError(f"dict key is not a name: {key!r}")
            out[key] = self.read_object()


# ---------------------------------------------------------------------------
# document structure

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


@dataclass
class _Obj:
    num: int
    value: object
    stream: bytes | None = None


def _scan_objects(data: bytes) -> dict[int, _Obj]:
    """All indirect objects by direct byte scan (xref never consulted)."""
    objs: dict[int, _Obj] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        rd = _Reader(data, m.end())
        try:
            value = rd.read_object()
        except PdfError:
            pos = m.end()
            continue
        stream = None
        sm = _STREAM_RE.match(data, _skip_ws_at(data, rd.pos))
        if sm and isinstance(value, dict):
            start = sm.end()
            length = value.get("Length")
            end = None
            if isinstance(length, int):
                cand = start + length
                if data[cand : cand + 32].lstrip(bytes(_WS)).startswith(b"endstream"):
                    end = cand
            if end is None:  # indirect/wrong /Length: search
                e = data.find(b"endstream", start)
                if e == -1:
                    pos = m.end()
                    continue
                end = e
                # the writer puts EOL before endstream; strip one
                if data[end - 2 : end] == b"\r\n":
                    end -= 2
                elif data[end - 1 : end] in (b"\n", b"\r"):
                    end -= 1
            stream = data[start:end]
            pos = end
        else:
            pos = rd.pos
        # later definitions of the same object number win (incremental
        # updates append to the file)
        objs[num] = _Obj(num, value, stream)
    return objs


def _skip_ws_at(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n and data[pos] in _WS:
        pos += 1
    return pos


class _Doc:
    def __init__(self, objs: dict[int, _Obj]):
        self.objs = objs

    def resolve(self, v, depth: int = 0):
        while isinstance(v, _Ref) and depth < 32:
            o = self.objs.get(v.num)
            v = o.value if o else None
            depth += 1
        return v

    def stream_of(self, v) -> bytes | None:
        if isinstance(v, _Ref):
            o = self.objs.get(v.num)
            if o is None or o.stream is None:
                return None
            return _decode_stream(self, o)
        return None


# decompression-bomb guard: a crawled PDF's Flate stream may expand to
# gigabytes from kilobytes; content streams are text operators, so anything
# past this is hostile, not text
_MAX_STREAM_BYTES = 64 * 1024 * 1024


def _inflate_capped(data: bytes, wbits: int) -> bytes | None:
    d = zlib.decompressobj(wbits)
    try:
        out = d.decompress(data, _MAX_STREAM_BYTES)
    except zlib.error:
        return None
    if d.unconsumed_tail:  # hit the cap mid-stream: bomb, not a document
        return None
    return out


def _decode_stream(doc: _Doc, obj: _Obj) -> bytes | None:
    filt = doc.resolve(obj.value.get("Filter")) if isinstance(obj.value, dict) else None
    raw = obj.stream or b""
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    data = raw
    for f in filters:
        f = doc.resolve(f)
        if f == "FlateDecode":
            out = _inflate_capped(data, zlib.MAX_WBITS)
            if out is None:
                out = _inflate_capped(data, -15)  # raw deflate
            if out is None:
                return None
            data = out
        elif f in ("ASCIIHexDecode",):
            hx = bytes(c for c in data if c in b"0123456789abcdefABCDEF")
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        else:
            return None  # image/unsupported filter: no text inside
    return data


# ---------------------------------------------------------------------------
# content-stream text extraction

_TOKEN_RE = re.compile(
    rb"""
      (?P<str>\()            # literal string start
    | (?P<hex><(?![<]))      # hex string start
    | (?P<dict><<|>>)
    | (?P<arr>\[|\])
    | (?P<name>/[^\s()<>\[\]{}/%]*)
    | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+))
    | (?P<op>[A-Za-z'"][A-Za-z0-9*'"]*)
    | (?P<comment>%[^\r\n]*)
    """,
    re.VERBOSE,
)

# kern threshold (thousandths of an em): TJ adjustments more negative than
# this read as an inter-word gap
_TJ_SPACE_KERN = -180


class _TextState:
    """Accumulates page text as LINES under the fixed layout rules,
    remembering the text-matrix y at each line's first show (the layout
    signal :func:`parse_pdf_layout` blocks on).  ``b"\\n".join`` of the
    line contents reproduces the flat-text pass byte for byte: a line is
    "open" exactly while the old accumulator's ``line_open`` was True."""

    def __init__(self):
        self.lines: list[tuple[float | None, bytes]] = []
        self._cur: bytearray | None = None  # None <=> not line_open
        self._cur_y: float | None = None
        self.last_tm_y: float | None = None
        # absolute-ish text position: Tm sets it, Td/TD/T* translate it.
        # "ish" because a content stream may never issue Tm; y is then
        # relative to the BT origin — still monotone per line advance,
        # which is all the block segmentation needs.
        self.y: float | None = None
        self.tl: float = 0.0  # leading (TL / TD)

    def newline(self) -> None:
        if self._cur is not None:
            self.lines.append((self._cur_y, bytes(self._cur)))
            self._cur = None

    def space(self) -> None:
        if self._cur is not None:
            self._cur += b" "

    def show(self, s: bytes) -> None:
        if self._cur is None:
            self._cur = bytearray()
            self._cur_y = self.y
        self._cur += s

    def result(self) -> list[tuple[float | None, bytes]]:
        self.newline()
        return self.lines


def _extract_text(content: bytes) -> bytes:
    """Flat page text: the line pass joined with newlines (byte-identical
    to the pre-layout accumulator; pinned by tests/test_pdf.py)."""
    return b"\n".join(t for _, t in _extract_lines(content))


def _num2(stack) -> tuple[float, float]:
    """Last two numeric operands (tx, ty) — 0 when absent/malformed."""
    ty = stack[-1] if stack and isinstance(stack[-1], (int, float)) else 0
    tx = (
        stack[-2]
        if len(stack) > 1 and isinstance(stack[-2], (int, float))
        else 0
    )
    return float(tx), float(ty)


def _extract_lines(content: bytes) -> list[tuple[float | None, bytes]]:
    state = _TextState()
    stack: list = []  # operand stack (strings/numbers/arrays we care about)
    rd = _Reader(content)
    pos = 0
    n = len(content)
    arr_depth = 0
    arr: list = []
    while pos < n:
        m = _TOKEN_RE.search(content, pos)
        if not m:
            break
        pos = m.end()
        kind = m.lastgroup
        if kind == "str":
            rd.pos = m.start()
            try:
                s = rd._read_literal_string()
            except PdfError:
                break
            pos = rd.pos
            (arr if arr_depth else stack).append(s)
        elif kind == "hex":
            rd.pos = m.start()
            try:
                s = rd._read_hex_string()
            except PdfError:
                break
            pos = rd.pos
            (arr if arr_depth else stack).append(s)
        elif kind == "arr":
            if m.group() == b"[":
                arr_depth += 1
                arr = []
            else:
                arr_depth = 0
                stack.append(arr)
                arr = []
        elif kind == "num":
            v = float(m.group()) if b"." in m.group() else int(m.group())
            (arr if arr_depth else stack).append(v)
        elif kind == "name" or kind == "dict" or kind == "comment":
            (arr if arr_depth else stack).append(None)
        elif kind == "op":
            op = m.group()
            if op == b"BT":
                state.last_tm_y = None
                state.y = 0.0  # BT resets the text matrix to identity
            elif op == b"Td" or op == b"TD":
                tx, ty = _num2(stack)
                if ty != 0:
                    state.newline()
                else:
                    state.space()
                if state.y is not None:
                    state.y += ty
                if op == b"TD":
                    state.tl = -ty
            elif op == b"TL":
                _, tl = _num2(stack)
                state.tl = tl
            elif op == b"T*":
                state.newline()
                if state.y is not None:
                    state.y -= state.tl
            elif op == b"Tm":
                ty = stack[-1] if stack and isinstance(stack[-1], (int, float)) else None
                if state.last_tm_y is not None and ty != state.last_tm_y:
                    state.newline()
                state.last_tm_y = ty
                state.y = float(ty) if ty is not None else None
            elif op == b"Tj":
                if stack and isinstance(stack[-1], bytes):
                    state.show(stack[-1])
            elif op == b"'":
                state.newline()
                if state.y is not None:
                    state.y -= state.tl
                if stack and isinstance(stack[-1], bytes):
                    state.show(stack[-1])
            elif op == b'"':
                state.newline()
                if state.y is not None:
                    state.y -= state.tl
                if stack and isinstance(stack[-1], bytes):
                    state.show(stack[-1])
            elif op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for item in stack[-1]:
                        if isinstance(item, bytes):
                            state.show(item)
                        elif (
                            isinstance(item, (int, float))
                            and item < _TJ_SPACE_KERN
                        ):
                            state.space()
            stack.clear()
    return state.result()


def _decode_text_bytes(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


# ---------------------------------------------------------------------------
# public API


@dataclass
class PdfPage:
    index: int
    text: str


@dataclass
class PdfDocument:
    pages: list[PdfPage]
    info: dict = field(default_factory=dict)

    @property
    def n_pages(self) -> int:
        return len(self.pages)

    @property
    def text(self) -> str:
        return "\n".join(p.text for p in self.pages)


def _page_order(doc: _Doc) -> list[_Obj]:
    """Page objects in catalog /Pages tree order; file order fallback."""
    root = None
    for obj in doc.objs.values():
        v = obj.value
        if isinstance(v, dict) and doc.resolve(v.get("Type")) == "Catalog":
            root = v
    ordered: list[_Obj] = []
    if root is not None:
        seen = set()

        def walk(node_ref, depth=0):
            if depth > 64:
                return
            node = doc.resolve(node_ref)
            if not isinstance(node, dict):
                return
            t = doc.resolve(node.get("Type"))
            if t == "Page":
                num = node_ref.num if isinstance(node_ref, _Ref) else None
                if num not in seen:
                    seen.add(num)
                    ordered.append(_Obj(num or -1, node))
            elif t == "Pages":
                for kid in doc.resolve(node.get("Kids")) or []:
                    walk(kid, depth + 1)

        walk(root.get("Pages"))
    if not ordered:
        for obj in sorted(doc.objs.values(), key=lambda o: o.num):
            if isinstance(obj.value, dict) and doc.resolve(obj.value.get("Type")) == "Page":
                ordered.append(obj)
    return ordered


def parse_pdf(data: bytes) -> PdfDocument:
    """Parse PDF bytes and extract per-page text.

    Raises :class:`PdfError` when the input is not a PDF (bad magic), is
    encrypted, or contains no parseable objects.
    """
    if not data.lstrip()[:5].startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    objs = _scan_objects(data)
    if not objs:
        raise PdfError("no parseable objects")
    doc = _Doc(objs)
    for obj in objs.values():
        v = obj.value
        if isinstance(v, dict) and "Encrypt" in v and "Root" in v:
            raise PdfError("encrypted PDF not supported")
    # trailer dict appears as a plain dict after 'trailer'; grab /Info
    info: dict = {}
    tpos = data.rfind(b"trailer")
    if tpos != -1:
        try:
            trailer = _Reader(data, tpos + len(b"trailer")).read_object()
        except PdfError:
            trailer = None
        if isinstance(trailer, dict):
            if "Encrypt" in trailer:
                raise PdfError("encrypted PDF not supported")
            tinfo = doc.resolve(trailer.get("Info"))
            if isinstance(tinfo, dict):
                for k, v in tinfo.items():
                    v = doc.resolve(v)
                    if isinstance(v, bytes):
                        info[k] = _decode_text_bytes(v)
    pages = []
    for i, pobj in enumerate(_page_order(doc)):
        contents = doc.resolve(pobj.value.get("Contents"))
        refs = (
            pobj.value.get("Contents")
            if isinstance(pobj.value.get("Contents"), _Ref)
            else None
        )
        chunks: list[bytes] = []
        if isinstance(contents, list):
            for ref in contents:
                s = doc.stream_of(ref)
                if s:
                    chunks.append(s)
        elif refs is not None:
            s = doc.stream_of(refs)
            if s:
                chunks.append(s)
        raw = _extract_text(b"\n".join(chunks)) if chunks else b""
        pages.append(PdfPage(index=i, text=_decode_text_bytes(raw)))
    return PdfDocument(pages=pages, info=info)


def pdf_text(data: bytes) -> str:
    """Whole-document text (pages joined with one newline)."""
    return parse_pdf(data).text


# ---------------------------------------------------------------------------
# layout blocks


@dataclass
class PdfBlock:
    page: int
    block_idx: int  # per page, top-to-bottom
    y_top: float | None
    y_bottom: float | None
    n_lines: int
    text: str


def _page_content_chunks(doc: _Doc, pobj: _Obj) -> list[bytes]:
    contents = doc.resolve(pobj.value.get("Contents"))
    refs = (
        pobj.value.get("Contents")
        if isinstance(pobj.value.get("Contents"), _Ref)
        else None
    )
    chunks: list[bytes] = []
    if isinstance(contents, list):
        for ref in contents:
            s = doc.stream_of(ref)
            if s:
                chunks.append(s)
    elif refs is not None:
        s = doc.stream_of(refs)
        if s:
            chunks.append(s)
    return chunks


def parse_pdf_layout(
    data: bytes, gap_factor: float = 1.8, min_gap: float = 4.0
) -> list[PdfBlock]:
    """Layout-aware block segmentation: per-page text lines (with their
    text-matrix y) grouped into visual blocks wherever the vertical gap
    between consecutive lines exceeds ``gap_factor`` x the page's typical
    leading (median |dy|), i.e. paragraph/section whitespace.

    The text is EXACTLY the flat extraction's text re-partitioned: the
    blocks' RAW line bytes in order are the flat pass's line list, so
    joining block texts with newlines reproduces :func:`pdf_text` for any
    self-consistently encoded document (byte-exact pre-decode; pinned by
    test on the utf-8 fixtures).  Layout adds structure, never changes
    content.  Lines with unknown y (streams that never position) stay
    attached to the current block.
    """
    if not data.lstrip()[:5].startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    objs = _scan_objects(data)
    if not objs:
        raise PdfError("no parseable objects")
    doc = _Doc(objs)
    for obj in objs.values():
        v = obj.value
        if isinstance(v, dict) and "Encrypt" in v and "Root" in v:
            raise PdfError("encrypted PDF not supported")
    blocks: list[PdfBlock] = []
    for p, pobj in enumerate(_page_order(doc)):
        chunks = _page_content_chunks(doc, pobj)
        lines = _extract_lines(b"\n".join(chunks)) if chunks else []
        if not lines:
            continue
        # typical leading: the MODE of absolute y-steps between consecutive
        # known-y lines (0 steps — same-y continuation — excluded).  The
        # mode, not the median: body-text leading is the most frequent
        # step, while a paragraph-heavy page can have enough gap steps to
        # drag a median up past the gaps themselves.  Ties break smaller.
        ys = [y for y, _ in lines]
        counts: dict[float, int] = {}
        for a, b in zip(ys, ys[1:]):
            if a is not None and b is not None and a != b:
                d = abs(a - b)
                counts[d] = counts.get(d, 0) + 1
        leading = (
            min(counts, key=lambda d: (-counts[d], d)) if counts else 0.0
        )
        threshold = max(gap_factor * leading, min_gap)
        cur: list[tuple[float | None, bytes]] = []
        idx = 0

        def flush():
            nonlocal idx, cur
            if not cur:
                return
            ys = [y for y, _ in cur if y is not None]
            blocks.append(
                PdfBlock(
                    page=p,
                    block_idx=idx,
                    y_top=max(ys) if ys else None,
                    y_bottom=min(ys) if ys else None,
                    n_lines=len(cur),
                    text="\n".join(_decode_text_bytes(t) for _, t in cur),
                )
            )
            idx += 1
            cur = []

        prev_y: float | None = None
        for y, t in lines:
            if (
                cur
                and y is not None
                and prev_y is not None
                and abs(prev_y - y) > threshold
            ):
                flush()
            cur.append((y, t))
            if y is not None:
                prev_y = y
        flush()
    return blocks
