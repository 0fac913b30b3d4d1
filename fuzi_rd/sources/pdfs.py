"""Deterministic synthetic PDF writer.

The north-star pipeline's extraction tier names "PDF/layout parse" beside
the HTML boilerplate strip.  This writer synthesizes the PDF input table
from ``documents.parquet`` the same way ``sources/pages.py`` synthesizes
the page table from nothing: every byte is a pure function of
``(text, seq)``, so any scale tier regenerates bit-identically.

Round-trip contract with :mod:`fuzi_rd.pdf` (the reader):

    ``pdf_text(make_pdf(text, seq)) == text``  for every ``text``/``seq``.

Page breaks consume existing newlines (pages re-join with ``"\\n"``), show
operators never add or drop a byte, and strings are written as UTF-8 so the
reader's decode heuristic (UTF-8 first) restores them exactly.  That exact
contract is what makes the ``pdf_extract`` query oracle-checkable: the
DuckDB oracle is simply the ``documents.text`` column.

Variety (all seq-derived, to keep the reader's robustness paths hot):

  - stream encoding: plain / FlateDecode / ASCIIHexDecode;
  - line advance per page: ``Td`` / ``T*`` (with ``TL``) / ``'`` / ``Tm``;
  - string show per line: ``Tj`` / split ``Tj Tj`` / hex string /
    ``TJ`` array with word-gap kerns (plus sub-threshold kerns that must
    NOT become spaces);
  - every 5th document gets a corrupted xref table (offsets zeroed) — the
    reader scans objects directly and must not care;
  - every 6th page splits its content across two streams (``/Contents``
    array).
"""

from __future__ import annotations

import binascii
import zlib

import pyarrow as pa

from fuzi_rd.pdf import _TJ_SPACE_KERN

__all__ = ["make_pdf", "pdfs_from_documents_batch", "LINES_PER_PAGE"]

LINES_PER_PAGE = 40

_ESC = {0x5C: b"\\\\", 0x28: b"\\(", 0x29: b"\\)", 0x0D: b"\\r", 0x0A: b"\\n"}


def _lit(s: str) -> bytes:
    """Literal PDF string ``(...)`` with escapes, UTF-8 payload."""
    out = bytearray(b"(")
    for b in s.encode("utf-8"):
        out += _ESC.get(b, bytes((b,)))
    out += b")"
    return bytes(out)


def _hex(s: str) -> bytes:
    return b"<" + binascii.hexlify(s.encode("utf-8")) + b">"


def _show_ops(line: str, h: int) -> bytes:
    """One line's show operator(s); exact-text contract, style by hash."""
    style = h % 4
    if style == 0:
        return _lit(line) + b" Tj"
    if style == 1:  # split into two Tj shows: concatenation, no separator
        cut = len(line) // 2
        return _lit(line[:cut]) + b" Tj " + _lit(line[cut:]) + b" Tj"
    if style == 2:
        return _hex(line) + b" Tj"
    # TJ array: words re-join via kern gaps below the -180/1000em threshold;
    # str.split(" ") keeps empty items, so runs of spaces round-trip too
    gap = str(_TJ_SPACE_KERN - 70 - h % 50).encode()  # e.g. -250..-299
    none_gap = str(-(h % 150)).encode()  # above threshold: must NOT space
    parts = []
    for w in line.split(" "):
        if parts:
            parts.append(gap)
        parts.append(_lit(w))
        if h % 3 == 0:
            parts.append(none_gap)  # harmless sub-threshold kern
    return b"[" + b" ".join(parts) + b"] TJ"


def _page_content(lines: list[str], seq: int, page_idx: int) -> bytes:
    """Content stream for one page under the reader's fixed layout rules."""
    h0 = (seq * 40503 + page_idx * 69621) & 0x7FFFFFFF
    advance = h0 % 4  # 0=Td 1=T* 2=' 3=Tm
    ops = [b"BT /F1 12 Tf"]
    if advance == 1:
        ops.append(b"14 TL")
    y = 720
    for j, line in enumerate(lines):
        h = (h0 + j * 131) & 0x7FFFFFFF
        if j == 0:
            # first placement: vertical move, but nothing shown yet so the
            # reader's newline() is a no-op
            ops.append(b"72 720 Td" if advance != 3 else b"1 0 0 1 72 720 Tm")
            ops.append(_show_ops(line, h))
            continue
        if advance == 0:
            ops.append(b"0 -14 Td")
            ops.append(_show_ops(line, h))
        elif advance == 1:
            ops.append(b"T*")
            ops.append(_show_ops(line, h))
        elif advance == 2:
            # ' = newline + show; only Tj-able payloads (needs one string)
            ops.append(_lit(line) + b" '")
        else:
            y -= 14
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(_show_ops(line, h))
    ops.append(b"ET")
    return b"\n".join(ops)


def _stream_obj(content: bytes, seq: int) -> bytes:
    """Stream object body (dict + stream), encoding chosen by seq."""
    enc = seq % 3
    if enc == 1:
        data = zlib.compress(content, 6)
        filt = b"/Filter /FlateDecode "
    elif enc == 2:
        data = binascii.hexlify(content) + b">"
        filt = b"/Filter /ASCIIHexDecode "
    else:
        data = content
        filt = b""
    return (
        b"<< " + filt + b"/Length %d >>\nstream\n" % len(data)
        + data
        + b"\nendstream"
    )


def make_pdf(text: str, seq: int = 0) -> bytes:
    """Deterministic PDF bytes whose extracted text is exactly ``text``."""
    all_lines = text.split("\n")
    page_lines = [
        all_lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(all_lines), LINES_PER_PAGE)
    ] or [[""]]

    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: b"<< /Title " + _lit(f"doc {seq}") + b" /Producer (fuzi_rd synth) >>",
    }
    next_num = 5
    kids: list[int] = []
    for p, lines in enumerate(page_lines):
        content = _page_content(lines, seq, p)
        page_num = next_num
        next_num += 1
        if (seq + p) % 6 == 5 and len(lines) > 1:
            # two content streams; the reader joins chunks with \n, so cut
            # at an operator boundary (between two whole lines)
            cut = len(lines) // 2
            c1 = _page_content(lines[:cut], seq, p)
            # second stream must CONTINUE the line sequence: force one
            # vertical move up front so the reader breaks the line between
            # the streams regardless of the page's advance style (a second
            # break from c2's own first placement is suppressed because
            # nothing has been shown yet)
            c2_ops = b"0 -14 Td\n" + _page_content(lines[cut:], seq, p)
            s1, s2 = next_num, next_num + 1
            next_num += 2
            objs[page_num] = (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> "
                b"/Contents [%d 0 R %d 0 R] >>" % (s1, s2)
            )
            objs[s1] = _stream_obj(c1, seq + p)
            objs[s2] = _stream_obj(c2_ops, seq + p + 1)
        else:
            s1 = next_num
            next_num += 1
            objs[page_num] = (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> "
                b"/Contents %d 0 R >>" % s1
            )
            objs[s1] = _stream_obj(content, seq + p)
        kids.append(page_num)

    objs[2] = (
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % k for k in kids)
        + b"] /Count %d >>" % len(kids)
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    max_num = max(objs)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    corrupt = seq % 5 == 4  # reader must not consult the xref
    for num in range(1, max_num + 1):
        off = 0 if corrupt else offsets.get(num, 0)
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info 4 0 R >>\n" % (max_num + 1)
        + b"startxref\n%d\n%%%%EOF\n" % xref_pos
    )
    return bytes(out)


def pdfs_from_documents_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn: documents (doc_id, text) -> (doc_id, pdf).

    Stateless and deterministic (seq = doc_id), so the synthesized corpus
    is identical across runs, batch sizes, and parallelism levels.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    pdfs = [make_pdf(t or "", int(d)) for d, t in zip(doc_ids, texts)]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "pdf": pa.array(pdfs, pa.large_binary()),
        }
    )
