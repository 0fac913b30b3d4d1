"""Sequence-packing token layout for training-shard preparation.

The last step before tokenized training data hits disk: every document is
assigned a deterministic position in a stream of fixed-length training
sequences ("packs").  Downstream shard writers can then emit pack files
independently — each document knows its pack id and token offset without
any global coordination at write time.

Layout rule (deterministic, engine- and SQL-expressible):
  * documents are hashed into ``n_bins`` independent token streams
    (``bin = doc_id % n_bins``) — bins are the unit of parallelism and of
    pack-file output;
  * within a bin, documents are ordered by ``doc_id`` and concatenated;
    ``tok_offset`` is the exclusive prefix sum of token counts;
  * ``pack_id = tok_offset // seq_len`` and
    ``offset_in_pack = tok_offset % seq_len`` place each document's first
    token in its pack (documents may straddle pack boundaries — standard
    packed-pretraining layout where the loader masks across boundaries).

Scale shape (100 TB): stage 1 reduces each document to a fixed-width
(doc_id, bin, n_tokens) row inside ``map_batches`` — text never enters the
exchange.  The only shuffle is ONE ``groupby(bin)`` over those 24-byte
rows; the per-bin prefix sum is a vectorized sort + cumsum.  A bin's rows
must fit in one task: at 24 bytes/doc, 10M docs/bin ≈ 240 MB — size
``n_bins ≈ corpus_docs / 5M`` (the bin count also sets the number of
independent pack streams, so more bins is natural at scale, not a cost).

Tokenization is the corpus-stats convention (whitespace split of trimmed
text, empties dropped) so token counts agree with `textstats.token_stats`
and the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _counts_batch(batch: pa.Table, doc_col: str, text_col: str, n_bins: int):
    # null text counts as zero tokens (the (t or '') convention); without
    # this a null row's null n_tokens becomes NaN in the per-bin cumsum
    # and corrupts every later offset in the bin
    text = pc.fill_null(batch.column(text_col), "")
    n_tokens = pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    )
    trimmed_len = pc.utf8_length(pc.utf8_trim_whitespace(text))
    n_tokens = pc.if_else(
        pc.equal(trimmed_len, 0), pa.scalar(0, pa.int32()), n_tokens
    )
    doc_ids = batch.column(doc_col)
    bins = doc_ids.to_numpy(zero_copy_only=False).astype(np.int64) % n_bins
    return pa.table(
        {
            doc_col: doc_ids,
            "bin": pa.array(bins, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
        }
    )


def pack_layout(
    ds,
    seq_len: int = 2048,
    n_bins: int = 16,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """Assign every document a (pack_id, offset) in fixed-length training
    sequences; returns a Dataset of
    ``(doc_id, bin, n_tokens, tok_offset, pack_id, offset_in_pack)``.

    ``doc_col`` must be a non-negative integer id (the bin hash is
    ``doc_id % n_bins``).  Zero-token documents occupy zero width: they
    get the layout position of their successor and contribute nothing.
    """

    def _layout(group: pa.Table) -> pa.Table:
        ids = group.column(doc_col).to_numpy(zero_copy_only=False)
        toks = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, toks = ids[order], toks[order]
        csum = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(toks, out=csum[1:])
        off = csum[:-1]
        return pa.table(
            {
                doc_col: pa.array(ids, pa.int64()),
                "bin": group.column("bin").take(pa.array(order)),
                "n_tokens": pa.array(toks, pa.int64()),
                "tok_offset": pa.array(off, pa.int64()),
                "pack_id": pa.array(off // seq_len, pa.int64()),
                "offset_in_pack": pa.array(off % seq_len, pa.int64()),
            }
        )

    counts = ds.map_batches(
        lambda b: _counts_batch(b, doc_col, text_col, n_bins),
        batch_format="pyarrow",
    )
    return counts.groupby("bin").map_groups(_layout, batch_format="pyarrow")


def shard_assign(
    ds,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
):
    """Deterministic shuffle-to-shards assignment for training output:
    append ``shard`` (md5-uniform in [0, n_shards)) and ``sort_key`` (the
    other 8 md5 bytes — a full-strength per-row shuffle rank).

    ``shard = md5_number_upper(seed:id) % n_shards`` and ``sort_key =
    md5_number_lower(seed:id)`` in DuckDB's exact semantics (first /
    last 8 digest bytes little-endian), so the assignment is
    SQL-oracle-checkable bit for bit.  A pure function of (seed, id):
    re-running, re-sharding or resuming can never move a document between
    shards, and changing ``seed`` gives an independent permutation per
    epoch.  Embarrassingly parallel — one ``map_batches``, no shuffle
    exchange at all."""
    import hashlib
    import struct

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    def assign(batch: pa.Table) -> pa.Table:
        shards = []
        keys = []
        for i in batch.column(id_col).to_pylist():
            d = hashlib.md5(f"{seed}:{i}".encode()).digest()
            shards.append(struct.unpack("<Q", d[:8])[0] % n_shards)
            keys.append(struct.unpack("<Q", d[8:])[0])
        return batch.append_column(
            "shard", pa.array(shards, pa.int64())
        ).append_column("sort_key", pa.array(keys, pa.uint64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def write_training_shards(
    ds,
    out_dir: str,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
):
    """Write the corpus as ``n_shards`` hive-partitioned shard directories
    (``shard=K/``) in deterministically shuffled order — the final "global
    shuffle + shard" step before training.

    Shard membership is the exact :func:`shard_assign` rule (no
    all-to-all ``random_shuffle`` over the corpus — the md5 assignment IS
    the permutation); rows are sorted by the ``sort_key`` shuffle rank
    BATCH-locally, so every output file is a concatenation of sorted runs
    (one fully sorted file per block under Ray's default one-file-per-
    block writer; if a writer setting coalesces blocks, still
    hash-randomized runs).  Either way a sequential reader of a shard's
    files sees hash-randomized document order and a standard reader-side
    shuffle buffer completes the pass — full per-file sortedness is NOT
    part of the contract (that would cost a global sort).  Partitioned
    layout keeps the output resumable/skippable per shard like every
    other writer here.

    Returns the assigned dataset (with ``shard``/``sort_key``) for
    callers that want to continue the pipeline."""
    assigned = shard_assign(ds, n_shards=n_shards, seed=seed, id_col=id_col)

    def _local_order(batch: pa.Table) -> pa.Table:
        return batch.sort_by("sort_key")

    assigned.map_batches(_local_order, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["shard"]
    )
    return assigned
