"""Inverted-index (postings) build + bucket-pruned lookup.

The search-serving artifact a corpus pipeline emits next to the training
shards: per-token postings lists (doc_id, term frequency), written as
parquet PARTITIONED BY TOKEN-HASH BUCKET so a lookup reads exactly one
bucket directory — 1/n_buckets of the index — never the whole artifact.

Scale shape (100 TB):

  1. each batch reduces to (token, doc_id, tf) rows inside ``map_batches``
     (per-document counts are the combiner — one row per distinct token
     per doc, not per occurrence);
  2. the bucket id is a pure function of the token (md5 % n_buckets), so
     the partitioned write is the ONLY exchange and it is hive-layout
     (``bucket=K/``) — the same pruning layout the extraction writer uses
     for url-hash parts;
  3. ``lookup_token`` derives the bucket from the query token and passes
     ONLY that directory to ``read_parquet`` — read pruning at the file
     level, the index analog of partition-pruned resume.

Token convention: the corpus-stats tokenizer (lowercase ``[^a-z]+``
split, `vocab.TOKEN_SPLIT_PATTERN`), so postings agree with `token_df` /
`tfidf_topk` and the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import pathlib

import pyarrow as pa
import pyarrow.compute as pc

from fuzi_rd.functions.vocab import TOKEN_SPLIT_PATTERN

DEFAULT_N_BUCKETS = 64


def token_bucket(token: str, n_buckets: int = DEFAULT_N_BUCKETS) -> int:
    return (
        int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")
        % n_buckets
    )


def postings_batch(text_col: str, doc_col: str, n_buckets: int):
    """Per-batch combiner: (token, doc, tf) rows, fully vectorized —
    dictionary-encode the flattened tokens, lexsort (doc, code), run-length
    encode the runs.  md5 bucketing runs once per DISTINCT token in the
    batch (the dictionary), not once per output row."""

    def _p(batch: pa.Table) -> pa.Table:
        import numpy as np

        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int32()),
                doc_col: pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), TOKEN_SPLIT_PATTERN
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        if len(flat) == 0:
            return empty
        parents_np = parents.filter(nonempty).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary

        order = np.lexsort((codes, parents_np))
        p_s, c_s = parents_np[order], codes[order]
        run_start = np.empty(len(p_s), dtype=bool)
        run_start[0] = True
        run_start[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(run_start)
        tf = np.diff(np.append(starts, len(p_s)))

        doc_ids = batch.column(doc_col).to_numpy(zero_copy_only=False)
        out_codes = c_s[starts]
        bucket_per_vocab = np.array(
            [token_bucket(t, n_buckets) for t in vocab.to_pylist()],
            dtype=np.int32,
        )
        return pa.table(
            {
                "token": pc.take(vocab, pa.array(out_codes, pa.int64())),
                "bucket": pa.array(bucket_per_vocab[out_codes], pa.int32()),
                doc_col: pa.array(doc_ids[p_s[starts]], pa.int64()),
                "tf": pa.array(tf, pa.int64()),
            }
        )

    return _p


def build_postings(
    ds,
    out_dir: str,
    text_col: str = "text",
    doc_col: str = "doc_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> str:
    """Write the bucket-partitioned postings index; returns ``out_dir``.

    Idempotent per directory (a ``_DONE`` marker skips rebuilds — delete
    the directory to rebuild after a corpus change).  Crash-safe: the
    index is written into a sibling temp directory and renamed into place,
    so a run that dies mid-write never leaves partial bucket files where
    the next build would append a second copy on top of them."""
    import shutil

    out = pathlib.Path(out_dir)
    done = out / "_DONE"
    if done.exists():
        return str(out)
    tmp = out.with_name(out.name + "._building")
    shutil.rmtree(tmp, ignore_errors=True)
    rows = ds.map_batches(
        postings_batch(text_col, doc_col, n_buckets), batch_format="pyarrow"
    )
    rows.write_parquet(str(tmp), partition_cols=["bucket"])
    (tmp / "_DONE").write_bytes(b"")
    if out.exists():  # stale partial build (no _DONE): replace it
        shutil.rmtree(out)
    tmp.rename(out)
    return str(out)


def lookup_token(
    index_dir: str,
    token: str,
    doc_col: str = "doc_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
):
    """Postings for one token: reads ONLY the token's ``bucket=K``
    directory (1/n_buckets of the index).  Returns a Dataset of
    ``(doc_col, tf)``.  A bucket directory that does not exist (token
    hashes to an empty bucket) yields an empty result."""
    import ray

    bucket_dir = pathlib.Path(index_dir) / f"bucket={token_bucket(token, n_buckets)}"
    if not bucket_dir.exists():
        return ray.data.from_arrow(
            pa.table(
                {doc_col: pa.array([], pa.int64()), "tf": pa.array([], pa.int64())}
            )
        )

    def _filter(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b.column("token"), token))
        return keep.select([doc_col, "tf"])

    return ray.data.read_parquet(str(bucket_dir)).map_batches(
        _filter, batch_format="pyarrow"
    )
