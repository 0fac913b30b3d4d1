"""Per-page HTML table extraction (structured data from the crawl).

The fourth product a crawl pipeline derives from pages, after main text,
outlinks, and head metadata: the contents of ``<table>`` elements as
relational rows.  Downstream consumers (dataset builders mining
infoboxes/specs/financial tables, QA-pair generators) want cells with
their (table, row, column) coordinates — not a text blob where the
extractor's whitespace collapse destroyed the grid.

``ExtractTables`` is an actor-pool ``map_batches`` stage with the same
shape as ``ExtractPages``/``ExtractLinks``/``ExtractMetadata`` (reference
precedent Sources/Actor.swift:278-405 — warm parser state per actor,
value rows across the boundary): one parse per page (C kernel with
per-document Python fallback), then one O(nodes) preorder scan using the
arena's ``subtree_end`` ranges.  Output is row-expanding — one row per
CELL — with hard caps on tables/page, rows/table, cells/row and chars/
cell, so a pathological page (a million-row scraped grid) cannot blow up
a block.

Nested tables: each ``<table>`` element gets its own ``table_idx`` in
document order; a nested table's cells belong to the INNER table only
(the outer table's scan skips the nested subtree).  ``colspan``/
``rowspan`` are surfaced as columns, not expanded — ``col_idx`` is the
positional cell index within its ``<tr>``.

Scale notes (100 TB): per-page cost is the parse (shared when composed
with extraction) + one bounded scan; every output column is fixed-width
or capped, no shuffle anywhere in the stage.
"""

from __future__ import annotations

import pyarrow as pa

from fuzi_rd.dom import ELEMENT
from fuzi_rd.html_parser import parse_html_bytes

MAX_TABLES_PER_PAGE = 50
MAX_ROWS_PER_TABLE = 1000
MAX_CELLS_PER_ROW = 100
MAX_CELL_CHARS = 1000

_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("table_idx", pa.int32()),
        ("row_idx", pa.int32()),
        ("col_idx", pa.int32()),
        ("is_header", pa.bool_()),
        ("colspan", pa.int32()),
        ("rowspan", pa.int32()),
        ("text", pa.string()),
    ]
)


def _span(attrs, key: str) -> int:
    v = (attrs or {}).get(key)
    if v is None:
        return 1
    try:
        n = int(str(v).strip())
    except ValueError:
        return 1
    return n if n >= 1 else 1


def _page_tables(arena, url: str, out: dict) -> None:
    """Append one row per cell of every table on the page to ``out``."""
    types = arena.types
    names = arena.names
    dead = arena.dead
    sub = arena.subtree_end
    n = len(types)

    # document-order table elements (nested ones included, each its own idx)
    tables = []
    i = 1
    while i < n and len(tables) < MAX_TABLES_PER_PAGE:
        if types[i] == ELEMENT and not dead[i] and names[i] == "table":
            tables.append(i)
        i += 1

    for t_idx, t in enumerate(tables):
        end = sub[t]  # exclusive: one past the last descendant
        row_idx = 0
        i = t + 1
        while i < end and row_idx < MAX_ROWS_PER_TABLE:
            if types[i] == ELEMENT and not dead[i]:
                name = names[i]
                if name == "table":
                    i = sub[i]  # nested table: belongs to its own idx
                    continue
                if name == "tr":
                    tr_end = sub[i]
                    col_idx = 0
                    j = i + 1
                    while j < tr_end and col_idx < MAX_CELLS_PER_ROW:
                        if types[j] == ELEMENT and not dead[j]:
                            cname = names[j]
                            if cname == "table":
                                j = sub[j]
                                continue
                            if cname in ("td", "th"):
                                text = " ".join(
                                    arena.string_value(j).split()
                                )[:MAX_CELL_CHARS]
                                attrs = arena.attrs[j]
                                out["url"].append(url)
                                out["table_idx"].append(t_idx)
                                out["row_idx"].append(row_idx)
                                out["col_idx"].append(col_idx)
                                out["is_header"].append(cname == "th")
                                out["colspan"].append(_span(attrs, "colspan"))
                                out["rowspan"].append(_span(attrs, "rowspan"))
                                out["text"].append(text)
                                col_idx += 1
                                j = sub[j]  # cell content already taken
                                continue
                        j += 1
                    if col_idx:
                        row_idx += 1
                    i = tr_end
                    continue
            i += 1


class ExtractTables:
    """Callable class for ``ds.map_batches(ExtractTables, concurrency=N,
    batch_format="pyarrow")`` over (url, html) pages.  Row-expanding: one
    row per table cell; pages that fail to parse (or have no tables)
    contribute zero rows — the poison-pill contract for row-expanding
    stages (same as ExtractLinks)."""

    def __init__(self):
        try:
            from fuzi_rd import chtml

            self._chtml = chtml if chtml.available() else None
        except Exception:
            self._chtml = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {f.name: [] for f in _SCHEMA}
        for url, raw in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            raw = raw or b""
            try:
                arena = None
                if self._chtml is not None:
                    try:
                        arena = self._chtml.parse_html_bytes_fast(raw)
                    except Exception:
                        arena = None  # Python parser is the authority
                if arena is None:
                    arena = parse_html_bytes(raw, track_lines=False)
                _page_tables(arena, url, out)
            except Exception:
                continue
        return pa.table({f.name: pa.array(out[f.name], f.type) for f in _SCHEMA})


def extract_tables_dataset(pages_ds, concurrency=None, batch_size: int = 256):
    """Wire ExtractTables onto a (url, html) Dataset (lazy)."""
    import ray

    if concurrency is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, int(n_cpus * 0.75))
    return pages_ds.map_batches(
        ExtractTables,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
