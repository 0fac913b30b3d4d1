"""Fast one-shot HTML tokenizer.

Drives the same tree-builder callbacks as the stdlib ``html.parser`` frontend
in ``html_parser.py``, but scans the whole document in one pass with
``str.find`` + a couple of compiled regexes — no incremental-feed
bookkeeping, no per-token position updates (lines are counted lazily).
Measured ~2x faster than the stdlib tokenizer on the bench corpus; behavior
is pinned by the same golden tests (tag-soup tolerant, case-normalizing,
script/style raw-text, full HTML5 entity decoding).

Tokenizer contract with the builder (see html_parser._HTMLBuilder):
    handle_starttag(tag, attrs)    attrs = [(name, value_or_None), ...]
    handle_startendtag(tag, attrs)
    handle_endtag(tag)
    handle_data(text)              entities already decoded
    handle_comment(text)
    handle_pi(data)
The builder reads the current source line from ``builder.cur_line``.
"""

from __future__ import annotations

import re
from html import unescape

_TAGNAME = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")
_ATTR = re.compile(
    r"""[\s/]*([^\s/>=]+)(\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?""",
)
_RAW_CLOSE = {
    "script": re.compile(r"</script", re.IGNORECASE),
    "style": re.compile(r"</style", re.IGNORECASE),
}
_ENDTAG = re.compile(r"</\s*([a-zA-Z][^\t\n\r\f >]*)\s*>")


def tokenize(s: str, builder) -> None:
    n = len(s)
    i = 0
    line = 1
    line_pos = 0  # source offset up to which `line` is accurate
    track_lines = getattr(builder, "track_lines", True)

    def advance_line(to: int) -> int:
        nonlocal line, line_pos
        if to > line_pos:
            line += s.count("\n", line_pos, to)
            line_pos = to
        return line

    builder.cur_line = 1
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            text = s[i:]
            if text:
                builder.handle_data(unescape(text) if "&" in text else text)
            break
        if lt > i:
            text = s[i:lt]
            builder.handle_data(unescape(text) if "&" in text else text)
        c = s[lt + 1 : lt + 2]
        if c == "/":
            m = _ENDTAG.match(s, lt)
            if m:
                builder.handle_endtag(m.group(1).lower())
                i = m.end()
            else:
                # bogus end tag: skip to '>'
                gt = s.find(">", lt + 1)
                i = n if gt < 0 else gt + 1
            continue
        if c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            m = _TAGNAME.match(s, lt + 1)
            tag = m.group(0).lower()
            j = m.end()
            attrs = []
            self_closing = False
            while j < n:
                ch = s[j]
                if ch == ">":
                    j += 1
                    break
                if ch == "/" and s[j + 1 : j + 2] == ">":
                    self_closing = True
                    j += 2
                    break
                if ch in " \t\n\r\f/":
                    j += 1
                    continue
                am = _ATTR.match(s, j)
                if am is None or am.end() == j:
                    j += 1
                    continue
                name = am.group(1).lower()
                if am.group(2) is None:
                    value = None
                else:
                    value = am.group(3)
                    if value is None:
                        value = am.group(4)
                    if value is None:
                        value = am.group(5) or ""
                    if "&" in value:
                        value = unescape(value)
                attrs.append((name, value))
                j = am.end()
            if track_lines:
                builder.cur_line = advance_line(lt)
            if self_closing:
                builder.handle_startendtag(tag, attrs)
            else:
                builder.handle_starttag(tag, attrs)
                raw = _RAW_CLOSE.get(tag)
                if raw is not None:
                    # raw-text element: content up to the close tag, verbatim
                    rm = raw.search(s, j)
                    if rm is None:
                        if j < n:
                            builder.handle_data(s[j:])
                        builder.handle_endtag(tag)
                        i = n
                        continue
                    if rm.start() > j:
                        builder.handle_data(s[j : rm.start()])
                    gt = s.find(">", rm.end())
                    builder.handle_endtag(tag)
                    j = n if gt < 0 else gt + 1
            i = j
            continue
        if c == "!":
            if s.startswith("<!--", lt):
                end = s.find("-->", lt + 4)
                if end < 0:
                    builder.handle_comment(s[lt + 4 :])
                    break
                builder.handle_comment(s[lt + 4 : end])
                i = end + 3
            else:
                # doctype or bogus declaration: skip to '>'
                gt = s.find(">", lt + 1)
                i = n if gt < 0 else gt + 1
            continue
        if c == "?":
            gt = s.find(">", lt + 1)
            data = s[lt + 2 : (n if gt < 0 else gt)]
            builder.handle_pi(data)
            i = n if gt < 0 else gt + 1
            continue
        # lone '<' is text
        builder.handle_data("<")
        i = lt + 1
