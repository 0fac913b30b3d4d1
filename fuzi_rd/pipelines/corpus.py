"""Corpus production: the composed training-data pipeline.

    pages (url, html)
      -> ExtractPages actor pool          main-content text + spans
      -> keep status == 'ok' and non-empty text
      -> lang-id + quality gate           (single fused batch pass)
      -> parquet checkpoint               (dedup reads it twice, streaming)
      -> exact dedup on extracted text    (hash groupby + semi-join keep)
      -> partitioned write + manifests    (same layout/resume as extraction)

Every stage is a batch transform over one streaming Dataset; the only
all-to-all exchanges are the dedup groupby on 16-byte digests and the
winner semi-join on urls.  This is the pipeline a 100 TB crawl-to-corpus
job runs;
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
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
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
    # checkpoint, lazy lineage would re-run the whole extraction per
    # consumer.  A parquet checkpoint (write once, re-read per consumer)
    # keeps the corpus on disk instead of pinned in the object store —
    # the streaming executor never holds more than in-flight blocks.
    import tempfile

    import ray

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="fuzi_rd_corpus_ckpt_")
    corpus.write_parquet(ckpt)
    corpus = ray.data.read_parquet(ckpt)

    # exact dedup on the EXTRACTED text: the winner scan shuffles only
    # (16-byte hash, url) pairs; the winner-url dataset then semi-joins
    # back against the checkpointed corpus (hash-partitioned on url) —
    # no driver-side winner set, no broadcast (same shape as
    # exact_dedup_keep).
    from fuzi_rd.functions.dedup import semi_join

    pairs = corpus.select_columns(["content_hash", "url"])
    winners_ds = pairs.groupby("content_hash").min("url")

    def _urls_only(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("min(url)")})

    keep_urls = winners_ds.map_batches(_urls_only, batch_format="pyarrow")
    return semi_join(corpus, keep_urls, "url", num_partitions)
