"""Corpus production: the composed training-data pipeline.

    pages (url, html)
      -> ExtractPages actor pool          main-content text + spans
      -> keep status == 'ok' and non-empty text
      -> lang-id + quality gate           (single fused batch pass)
      -> exact dedup on extracted text    (hash groupby + winner broadcast)
      -> partitioned write + manifests    (same layout/resume as extraction)

Every stage is a batch transform over one streaming Dataset — no
materialization between stages; the only shuffle is the dedup groupby on
16-byte digests.  This is the pipeline a 100 TB crawl-to-corpus job runs;
each piece is individually oracle-verified, this module is their
composition.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from fuzi_rd.functions.textstats import guess_lang, quality_batch
from fuzi_rd.pipelines.extraction import extract_dataset


def corpus_dataset(
    pages_ds,
    min_text_len: int = 30,
    concurrency=None,
    batch_size: int = 256,
    dedup: bool = True,
):
    """Wire the full corpus pipeline onto a page Dataset (lazy).

    Returns a Dataset of (url, part, title, extracted_text, text_len,
    lang_guess, text_hash) — the cleaned, deduplicated corpus."""
    extracted = extract_dataset(
        pages_ds, concurrency=concurrency, batch_size=batch_size
    )

    def clean_and_annotate(batch: pa.Table) -> pa.Table:
        # keep successful extractions with enough text
        keep = pc.and_(
            pc.equal(batch.column("status"), "ok"),
            pc.greater_equal(batch.column("text_len"), min_text_len),
        )
        batch = batch.filter(keep)
        texts = batch.column("extracted_text").to_pylist()
        quality = quality_batch(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        batch = batch.filter(quality.column("quality_ok"))
        texts = batch.column("extracted_text").to_pylist()
        langs = [guess_lang(t) for t in texts]
        digests = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts
        ]
        return pa.table(
            {
                "url": batch.column("url"),
                "part": batch.column("part"),
                "title": batch.column("title"),
                "extracted_text": batch.column("extracted_text"),
                "text_len": batch.column("text_len"),
                "lang_guess": pa.array(langs, pa.string()),
                "content_hash": pa.array(digests, pa.string()),
            }
        )

    corpus = extracted.map_batches(clean_and_annotate, batch_format="pyarrow")
    if not dedup:
        return corpus

    # The winner scan and the keep filter both consume `corpus`; without a
    # pin, lazy lineage would re-run the whole extraction per consumer.
    # materialize() pins the (much smaller, post-filter) corpus in the
    # object store — at extreme scale swap this for a parquet checkpoint
    # (write corpus, re-read for both passes).
    corpus = corpus.materialize()

    # exact dedup on the EXTRACTED text: shuffle carries (hash, url) pairs
    # only; winners broadcast once (same scale shape as exact_dedup_keep)
    import ray

    pairs = corpus.select_columns(["content_hash", "url"])
    winners_ds = pairs.groupby("content_hash").min("url")
    winners = ray.put(
        frozenset(r["min(url)"] for r in winners_ds.take_all())
    )

    class KeepWinners:
        def __init__(self):
            self.keep = ray.get(winners)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [u in self.keep for u in batch.column("url").to_pylist()],
                pa.bool_(),
            )
            return batch.filter(mask)

    return corpus.map_batches(
        KeepWinners, batch_format="pyarrow", concurrency=(1, 8)
    )
