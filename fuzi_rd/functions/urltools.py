"""URL canonicalization for crawl dedup/join keys.

A crawl pipeline keys almost everything by url (dedup, resume partitioning,
attribution joins); raw crawl urls differ in case, fragments, tracking
params and trailing slashes without identifying different resources.
``url_normalize_batch`` applies a deterministic, regex-specified
canonicalization that a SQL engine can reproduce exactly (the DuckDB
oracle runs the same RE2 chain), fully vectorized — no per-row Python.

Normalization steps, in order:
  1. strip the fragment            (#... to end)
  2. drop utm_* tracking params    (three-step regex chain, order matters:
                                    '&utm_x' anywhere, then '?utm_x&' -> '?',
                                    then a lone '?utm_x' tail)
  3. lowercase scheme + authority  (host names are case-insensitive; paths
                                    are not — only the prefix is lowered)
  4. strip trailing slashes        ('/+$')
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_FRAGMENT = r"#.*$"
_UTM_MID = r"&utm_[^&#]*"
_UTM_FIRST_MORE = r"\?utm_[^&#]*&"
_UTM_FIRST_ONLY = r"\?utm_[^&#]*$"
_AUTHORITY = r"^(?P<pre>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"
_TRAILING = r"/+$"


def normalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Vectorized canonicalization of a url string column."""
    s = pc.replace_substring_regex(urls, _FRAGMENT, "")
    s = pc.replace_substring_regex(s, _UTM_MID, "")
    s = pc.replace_substring_regex(s, _UTM_FIRST_MORE, "?")
    s = pc.replace_substring_regex(s, _UTM_FIRST_ONLY, "")
    # lowercase scheme+authority only: capture (prefix)(rest), lower the
    # prefix, rejoin.  Rows without a scheme (relative urls) don't match
    # extract_regex (null struct) and pass through unchanged.
    parts = pc.extract_regex(s, _AUTHORITY)
    pre = pc.utf8_lower(pc.struct_field(parts, "pre"))
    rest = pc.struct_field(parts, "rest")
    joined = pc.binary_join_element_wise(pre, rest, "")
    s = pc.if_else(pc.is_valid(joined), joined, s)
    return pc.replace_substring_regex(s, _TRAILING, "")


def url_normalize_batch(batch: pa.Table, col: str = "url") -> pa.Table:
    """map_batches form: appends ``url_norm`` next to the input columns."""
    return batch.append_column("url_norm", normalize_urls(batch.column(col)))
