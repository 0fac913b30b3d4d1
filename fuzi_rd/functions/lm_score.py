"""Unigram language-model surprisal scoring.

The CCNet/Gopher-style corpus-quality signal one step up from the
`textstats` ratios: score each document by the negative log-likelihood of
its tokens under a unigram model fit on the corpus itself.  Unusually
fluent or degenerate documents (boilerplate, keyword stuffing, lorem
ipsum) sit in the tails of the per-token mean.

Shape at 100 TB — the canonical two-stage broadcast pattern:

1. **Fit**: per-batch partial token counts (a combiner inside
   ``map_batches``, so only unique-tokens-per-batch rows reach the
   exchange) -> small ``groupby("tok").sum`` -> optional ``top_k`` cap
   (``sort + limit``).  The vocabulary, not the corpus, crosses the wire.
2. **Score**: the vocabulary dict goes to the object store ONCE via
   ``ray.put``; a scoring actor pool reads it zero-copy per actor and
   scores batches locally.  No shuffle touches document rows.

The driver holds only the (capped) vocabulary — with ``top_k`` set this is
bounded regardless of corpus size; tokens outside the cap score as
count-1 events ("OOV" surprisal).  With ``top_k=None`` (the oracle
setting) the fit is exact and the result matches a DuckDB re-derivation
token for token.

Scores are integer fixed-point — ``floor(-1000 * ln(c / total))`` milli-
nats per token — so sums and means are exact integers and the DuckDB
oracle can't drift by float-summation order.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

__all__ = ["fit_unigram_vocab", "unigram_logprob"]

_TOKEN_RE = re.compile(r"\s+")

# skew guard, ON by default (the df_cap lesson: production entry points
# must not ship with the hazard live): an unbroken megabyte "token" is
# binary junk, not vocabulary, and would ride the count shuffle as a
# megabyte key.  The oracle query passes None (exact, whitespace-only).
DEFAULT_MAX_TOKEN_CHARS = 1024


def _tokens(text: str, max_chars: int | None) -> list[str]:
    # mirrors the oracle-proven textstats convention:
    # string_split_regex(trim(text), '\s+') with empties dropped
    if not text or not text.strip():
        return []
    toks = [t for t in _TOKEN_RE.split(text.strip()) if t]
    if max_chars is not None:
        toks = [t for t in toks if len(t) <= max_chars]
    return toks


def _count_batch(batch: pa.Table, text_col: str, max_chars: int | None) -> pa.Table:
    counts: dict[str, int] = {}
    for text in batch.column(text_col).to_pylist():
        for tok in _tokens(text or "", max_chars):
            counts[tok] = counts.get(tok, 0) + 1
    return pa.table(
        {
            "tok": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        }
    )


def fit_unigram_vocab(
    ds,
    text_col: str = "text",
    top_k: int | None = None,
    max_token_chars: int | None = DEFAULT_MAX_TOKEN_CHARS,
):
    """Fit the unigram model; returns ``(vocab: dict[str, int], total: int)``.

    ``total`` is the full corpus token count (computed BEFORE the cap, so
    capped and uncapped fits agree on every retained token's probability).
    ``max_token_chars`` drops degenerate over-long "tokens" before they ride
    the count shuffle as keys; pass ``None`` for exact oracle parity.
    """
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        lambda b: _count_batch(b, text_col, max_token_chars),
        batch_format="pyarrow",
    )
    # materialize the (small) vocabulary table once: lazy plans re-execute
    # the whole upstream per consumer, and we consume it twice below
    agg = counts.groupby("tok").aggregate(Sum("c", alias_name="c")).materialize()
    total = int(agg.sum("c") or 0)
    if top_k is not None:
        agg = agg.sort("c", descending=True).limit(top_k)
    vocab = {
        r["tok"]: int(r["c"]) for r in agg.iter_rows()
    }
    return vocab, total


class _ScoreDocs:
    """Actor-pool scorer: vocabulary read from the object store once per
    actor (zero-copy broadcast), integer milli-nat arithmetic per batch."""

    def __init__(
        self,
        vocab_ref,
        total: int,
        id_col: str,
        text_col: str,
        max_token_chars: int | None,
    ):
        import ray

        vocab: dict[str, int] = ray.get(vocab_ref)
        self.id_col = id_col
        self.text_col = text_col
        self.max_token_chars = max_token_chars
        # precompute per-token integer surprisal; OOV = count-1 event
        self.milli = {
            tok: math.floor(-1000.0 * math.log(c / total))
            for tok, c in vocab.items()
        }
        self.oov = math.floor(-1000.0 * math.log(1.0 / max(total, 1)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_ids, n_toks, sums, means = [], [], [], []
        milli, oov = self.milli, self.oov
        for i, text in zip(ids, texts):
            toks = _tokens(text or "", self.max_token_chars)
            if not toks:
                continue  # zero-token docs have no likelihood; excluded
            s = sum(milli.get(t, oov) for t in toks)
            out_ids.append(i)
            n_toks.append(len(toks))
            sums.append(s)
            means.append(s // len(toks))
        return pa.table(
            {
                self.id_col: pa.array(out_ids, pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "surprisal_milli": pa.array(sums, pa.int64()),
                "mean_surprisal_milli": pa.array(means, pa.int64()),
            }
        )


def unigram_logprob(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
    max_token_chars: int | None = DEFAULT_MAX_TOKEN_CHARS,
    concurrency: int | None = None,
    batch_size: int = 4096,
):
    """Score every document's unigram surprisal; returns a Dataset.

    ``top_k``: cap the broadcast vocabulary to the K most frequent tokens
    (driver + object-store memory bound at crawl scale); uncapped fits are
    exact and oracle-checkable.  ``max_token_chars`` (on by default) drops
    degenerate over-long tokens in BOTH fit and score; the oracle query
    passes ``None``.  Zero-token documents are excluded (they have no
    likelihood under the model).
    """
    import ray

    vocab, total = fit_unigram_vocab(
        ds, text_col=text_col, top_k=top_k, max_token_chars=max_token_chars
    )
    vocab_ref = ray.put(vocab)
    if concurrency is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, int(n_cpus * 0.75))
    return ds.map_batches(
        _ScoreDocs,
        fn_constructor_kwargs={
            "vocab_ref": vocab_ref,
            "total": total,
            "id_col": id_col,
            "text_col": text_col,
            "max_token_chars": max_token_chars,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
