"""Corpus-level vocabulary and distribution statistics.

  token_counts       global term frequencies (word-count with a per-batch
                     combiner: only (token, partial_count) pairs shuffle)
  vocab_topk         top-k most frequent tokens, deterministic tiebreak
  length_histogram   exact histogram of document character lengths
  length_quantiles   exact length quantiles from the histogram (DuckDB
                     quantile_disc semantics: value at rank ceil(q*n)-1)

Scale notes (100 TB): token counting is the canonical combiner pattern —
each batch collapses to its distinct tokens before the groupby, so the
exchange carries vocabulary-sized partials, not corpus-sized token streams.
The quantile path reduces the corpus to a (distinct-length -> count)
histogram first; distinct lengths are bounded by the max document size
(~1e6 rows worst case), so pulling the histogram to the driver is a
fixed-size reduction, not a dataset materialization.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# lowercase alpha runs; everything else is a separator.  Matches the oracle
# `regexp_split_to_array(lower(text), '[^a-z]+')` exactly (both RE2 on UTF-8).
TOKEN_SPLIT_PATTERN = "[^a-z]+"


def _rename_or_empty(names, types):
    """Positional rename that tolerates the schema-less zero-row blocks
    Ray's Aggregate operator emits for empty hash partitions."""
    schema = pa.schema(list(zip(names, types)))

    def _r(b: pa.Table) -> pa.Table:
        if b.num_columns != len(names):
            return schema.empty_table()
        return b.rename_columns(names)

    return _r


def _token_partial_counts(text_col: str):
    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), TOKEN_SPLIT_PATTERN
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.combine_chunks().value_counts() if isinstance(
            flat, pa.ChunkedArray
        ) else flat.value_counts()
        return pa.table({"token": vc.field(0), "cnt": vc.field(1)})

    return _partial


def token_counts(ds, text_col: str = "text"):
    """Global term frequencies: (token, freq), one row per distinct token.

    The per-batch ``value_counts`` is the combiner — the groupby shuffles
    at most |batch vocabulary| rows per batch, never one row per token
    occurrence."""
    partials = ds.map_batches(_token_partial_counts(text_col), batch_format="pyarrow")
    summed = partials.groupby("token").sum("cnt")
    return summed.map_batches(
        _rename_or_empty(["token", "freq"], [pa.string(), pa.int64()]),
        batch_format="pyarrow",
    )


def vocab_topk(ds, k: int = 100, text_col: str = "text"):
    """Top-k most frequent tokens with a deterministic tiebreak
    (freq desc, token asc).  The sort input is the global vocabulary —
    tiny next to the corpus — so a full distributed sort + limit is fine
    even when the corpus is 100 TB."""
    return token_counts(ds, text_col).sort(
        ["freq", "token"], descending=[True, False]
    ).limit(k)


def length_histogram(ds, text_col: str = "text"):
    """Exact histogram of document character lengths: (n_chars, n_docs)."""

    def _lens(batch: pa.Table) -> pa.Table:
        lens = pc.cast(pc.utf8_length(batch.column(text_col)), pa.int64())
        # NULL text carries no length — same as quantile_disc's NULL handling
        return pa.table({"n_chars": lens.drop_null()})

    hist = ds.map_batches(_lens, batch_format="pyarrow").groupby("n_chars").count()
    return hist.map_batches(
        _rename_or_empty(["n_chars", "n_docs"], [pa.int64(), pa.int64()]),
        batch_format="pyarrow",
    )


def length_quantiles(ds, qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99), text_col: str = "text"):
    """EXACT length quantiles — (q, n_chars), DuckDB ``quantile_disc``
    semantics (the element at sorted rank ``ceil(q*n)-1``).

    Runs as a distributed histogram reduction; only the
    (distinct length, count) table — bounded by the max document length,
    independent of corpus row count — reaches the driver."""
    hist = length_histogram(ds, text_col)
    parts = [b for b in hist.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return pa.table({"q": pa.array([], pa.float64()), "n_chars": pa.array([], pa.int64())})
    tbl = pa.concat_tables(parts)
    lens = tbl.column("n_chars").to_numpy(zero_copy_only=False)
    counts = tbl.column("n_docs").to_numpy(zero_copy_only=False)
    order = np.argsort(lens)
    lens, counts = lens[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = max(0, math.ceil(q * n) - 1)  # 0-based rank of quantile_disc
        idx = int(np.searchsorted(cum, rank + 1))
        out_q.append(float(q))
        out_v.append(int(lens[idx]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "n_chars": pa.array(out_v, pa.int64())}
    )
