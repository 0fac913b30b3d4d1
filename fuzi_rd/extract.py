"""Main-content extraction: text-density / link-density boilerplate stripping.

The north-star payload (BASELINE.json `north_star`), built ON the query core
— not present in the reference library itself, which supplies the parse +
stringValue machinery (reference precedent for script/style text handling:
Tests/ActorHardeningTests.swift:893-909; mutation primitive `remove()`:
Sources/Element.swift:196-216).

Deterministic spec (SURVEY.md §2.8) — all comparisons are exact integer
arithmetic so results are bit-stable across platforms:

  1. Parse html -> arena DOM (tag-soup tolerant).
  2. Kill list: `script style noscript template iframe svg` elements,
     comments, PIs — marked dead (never serialized, never counted).
  3. Atomic blocks: block-level elements with no live block-level
     descendant (plus `body` itself when it has no block children).
  4. Per block: text_len (chars of stringValue), tag_count (1 + element
     descendants), link_text_len (chars of text under `a` descendants).
     Keep iff  text_len >= TD_NUM * tag_count  (text density >= 10)
          and  LD_DEN * link_text_len <= LD_NUM * text_len  (link density <= 0.33)
  5. extracted_text = kept blocks' stringValue joined by "\n" in document
     order; spans = per-kept-block {path, start, end} (UTF-8 byte offsets
     into extracted_text; path is an XPath-like node path).
"""

from __future__ import annotations

from fuzi_rd.dom import COMMENT, ELEMENT, PI, Arena

_NULL = -1

KILL_TAGS = frozenset(("script", "style", "noscript", "template", "iframe", "svg"))

BLOCK_TAGS = frozenset(
    "address article aside blockquote dd div dl dt fieldset figcaption figure"
    " footer form h1 h2 h3 h4 h5 h6 header hr li main nav ol p pre section"
    " table td th tr ul".split()
)

# thresholds as exact rationals: text_density >= 10/1, link_density <= 33/100
TD_NUM, TD_DEN = 10, 1
LD_NUM, LD_DEN = 33, 100


def kill_boilerplate_nodes(arena: Arena) -> int:
    """Mark script/style/noscript/template/comment/PI nodes dead.

    Returns the number of nodes killed."""
    types = arena.types
    names = arena.names
    killed = 0
    for nid in range(1, len(types)):
        t = types[nid]
        if t == ELEMENT:
            if names[nid] in KILL_TAGS:
                arena.remove(nid)
                killed += 1
        elif t == COMMENT or t == PI:
            arena.remove(nid)
            killed += 1
    return killed


def _node_path(arena: Arena, nid: int) -> str:
    """XPath-like path, e.g. /html/body/div[2]/p[1] (1-based sibling index
    among same-tag element siblings)."""
    parts = []
    names = arena.names
    parents = arena.parents
    prev = arena.prev_sib
    types = arena.types
    while nid > 0:
        name = names[nid]
        idx = 1
        s = prev[nid]
        while s != _NULL:
            if types[s] == ELEMENT and names[s] == name:
                idx += 1
            s = prev[s]
        parts.append(f"{name}[{idx}]")
        nid = parents[nid]
    return "/" + "/".join(reversed(parts))


def extract_main_content(arena: Arena):
    """Run the density heuristics over a (already kill-listed) arena.

    Returns (extracted_text, spans) where spans is a list of
    {path, start, end} dicts with UTF-8 byte offsets into extracted_text."""
    types = arena.types
    names = arena.names
    end = arena.subtree_end
    dead = arena.dead
    parents = arena.parents
    n = len(types)

    # effective-dead: node or any ancestor marked dead (single preorder pass)
    if arena.n_dead:
        eff_dead = [False] * n
        for nid in range(1, n):
            p = parents[nid]
            eff_dead[nid] = dead[nid] or (p > 0 and eff_dead[p])
    else:
        eff_dead = dead  # all False

    # one pass: identify live block elements and whether they contain a
    # live block descendant
    is_block = [False] * n
    has_block_desc = [False] * n
    body_id = _NULL
    for nid in range(1, n):
        if types[nid] != ELEMENT or eff_dead[nid]:
            continue
        name = names[nid]
        if name == "body" and body_id == _NULL:
            body_id = nid
        if name in BLOCK_TAGS:
            is_block[nid] = True
            # mark all ancestors as having a block descendant
            p = parents[nid]
            while p > 0 and not has_block_desc[p]:
                has_block_desc[p] = True
                p = parents[p]

    candidates = [
        nid for nid in range(1, n) if is_block[nid] and not has_block_desc[nid]
    ]
    if not candidates and body_id != _NULL and not has_block_desc[body_id]:
        candidates = [body_id]

    texts_arr = arena.texts
    TEXTISH = (3, 4)  # TEXT, CDATA

    def _live_text(nid: int) -> str:
        # contiguous preorder scan honoring eff_dead — much cheaper than the
        # generic pointer-walk string_value once nodes are kill-listed
        out = []
        i = nid
        stop = end[nid]
        while i < stop:
            if dead[i]:
                i = end[i]
                continue
            if types[i] in TEXTISH:
                out.append(texts_arr[i])
            i += 1
        return "".join(out)

    kept = []
    for nid in candidates:
        text = _live_text(nid)
        text_len = len(text)
        if text_len == 0:
            continue
        # tag_count / link_text_len over the live subtree
        tag_count = 1
        link_text_len = 0
        i = nid + 1
        stop = end[nid]
        while i < stop:
            if dead[i]:
                i = end[i]
                continue
            if types[i] == ELEMENT:
                tag_count += 1
                if names[i] == "a":
                    link_text_len += len(_live_text(i))
                    i = end[i]
                    continue
            i += 1
        if text_len < TD_NUM * tag_count:
            continue
        if LD_DEN * link_text_len > LD_NUM * text_len:
            continue
        kept.append((nid, text))

    pieces = []
    spans = []
    offset = 0
    for nid, text in kept:
        b = len(text.encode("utf-8"))
        spans.append(
            {"path": _node_path(arena, nid), "start": offset, "end": offset + b}
        )
        pieces.append(text)
        offset += b + 1  # +1 for the "\n" joiner
    return "\n".join(pieces), spans


def extract_from_html(html, encoding: str | None = None):
    """Full single-document pipeline: parse -> kill -> densities.

    Returns dict with extracted_text, spans, title, n_nodes."""
    from fuzi_rd.html_parser import parse_html_bytes

    arena = parse_html_bytes(html, encoding)
    title = _title_of(arena)
    kill_boilerplate_nodes(arena)
    text, spans = extract_main_content(arena)
    return {
        "extracted_text": text,
        "spans": spans,
        "title": title,
        "n_nodes": arena.n_nodes(),
    }


def _title_of(arena: Arena) -> str:
    root = arena.root
    if root == _NULL:
        return ""
    for c in arena.iter_element_children(root):
        if arena.names[c] == "head":
            for cc in arena.iter_element_children(c):
                if arena.names[cc] == "title":
                    return arena.string_value(cc)
    return ""
