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
job runs; each piece is individually oracle-verified, this module is their
composition.

``run_corpus`` is the job form: two-level crash resume with per-partition
lineage manifests (state/manifest.py) for BOTH the checkpoint (the
expensive extraction) and the final deduplicated output.  Resume
correctness hinges on one invariant: exact-dedup winners are a pure
function of the FULL checkpoint (min url per content hash), so recomputing
only the missing output partitions against the full checkpoint reproduces
a fresh run byte-for-byte.
"""

from __future__ import annotations

import hashlib
import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

from fuzi_rd.functions.textstats import guess_lang, quality_batch
from fuzi_rd.pipelines.extraction import extract_dataset
from fuzi_rd.stages.extractor import DEFAULT_NUM_PARTS
from fuzi_rd.state import manifest as mf


def _cluster_node_count() -> int:
    import ray

    try:
        return sum(1 for n in ray.nodes() if n.get("Alive"))
    except Exception:
        return 1


def corpus_dataset(
    pages_ds,
    min_text_len: int = 30,
    concurrency=None,
    batch_size: int = 256,
    dedup: bool = True,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    num_parts: int = DEFAULT_NUM_PARTS,
    skip_parts: set[int] | None = None,
    emit_markdown: bool = False,
    emit_metadata: bool = False,
    emit_links: bool = False,
):
    """Wire the full corpus pipeline onto a page Dataset (lazy).

    Returns a Dataset of (url, part, title, extracted_text, text_len,
    lang_guess, content_hash, text_hash) — the cleaned, deduplicated
    corpus.  With ``emit_markdown`` / ``emit_metadata`` the rows also
    carry structure-preserving markdown and head-metadata columns,
    produced from the SAME parse inside the extraction actor pool (no
    second pass over the html) and byte-identical to the standalone
    ``ConvertMarkdown`` / ``ExtractMetadata`` stages — one job emits
    training-ready text + curation metadata in a single pass.
    ``emit_links`` adds the resolved-outlink column the same way (edge
    rows byte-identical to the standalone ``ExtractLinks``); flatten it
    with ``links_from_extracted`` to feed ``link_graph`` /
    ``domain_components`` / ``pagerank`` — the webgraph as a by-product
    of the one parse this job already pays for.

    Checkpoint policy (the dedup stage consumes the corpus twice, so it
    must be written once and re-read): ``checkpoint_dir`` must be on
    storage every node can read — on a multi-node cluster a node-local
    path silently loses every block written by other nodes, so when the
    cluster has >1 node the argument is REQUIRED (``run_corpus`` derives
    it from the job's output directory, which is shared by construction).
    A non-empty ``checkpoint_dir`` is cleared first: stale files from a
    prior run would be re-read as duplicate documents."""
    extracted = extract_dataset(
        pages_ds,
        concurrency=concurrency,
        batch_size=batch_size,
        num_parts=num_parts,
        skip_parts=skip_parts,
        emit_markdown=emit_markdown,
        emit_metadata=emit_metadata,
        emit_links=emit_links,
    )
    extra_cols = (["markdown"] if emit_markdown else []) + (["links"] if emit_links else []) + (
        [
            "meta_title", "meta_description", "canonical_url", "meta_lang",
            "robots_noindex", "robots_nofollow",
            "og_title", "og_description", "og_image", "og_type",
        ]
        if emit_metadata
        else []
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
        cols = {
            "url": batch.column("url"),
            "part": batch.column("part"),
            "title": batch.column("title"),
            "extracted_text": batch.column("extracted_text"),
            "text_len": batch.column("text_len"),
            "lang_guess": pa.array(langs, pa.string()),
            "content_hash": pa.array(digests, pa.string()),
            # per-row crc32 carried through for order-independent
            # partition checksums in the manifests
            "text_hash": batch.column("text_hash"),
        }
        for c in extra_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    corpus = extracted.map_batches(clean_and_annotate, batch_format="pyarrow")
    if not dedup:
        return corpus

    import tempfile

    import ray

    if checkpoint_dir is None:
        if _cluster_node_count() > 1:
            raise ValueError(
                "corpus_dataset(dedup=True) on a multi-node cluster needs an "
                "explicit checkpoint_dir on shared storage (a node-local "
                "tempdir would lose every block written on other nodes); "
                "use run_corpus(), which derives it from the output dir"
            )
        ckpt = tempfile.mkdtemp(prefix="fuzi_rd_corpus_ckpt_")
    else:
        ckpt = checkpoint_dir
        p = Path(ckpt)
        if p.is_dir() and any(p.iterdir()):
            # stale checkpoint from a prior run would duplicate documents
            shutil.rmtree(ckpt)
        p.mkdir(parents=True, exist_ok=True)
    corpus.write_parquet(ckpt)
    corpus = ray.data.read_parquet(ckpt)
    return _dedup_keep_by_hash(corpus, num_partitions)


def _dedup_keep_by_hash(corpus, num_partitions: int | None = None):
    """Exact dedup on the EXTRACTED text: the winner scan shuffles only
    (16-byte hash, url) pairs; the winner-url dataset then semi-joins back
    against the corpus (hash-partitioned on url) — no driver-side winner
    set, no broadcast (same shape as exact_dedup_keep)."""
    from fuzi_rd.functions.dedup import semi_join

    pairs = corpus.select_columns(["content_hash", "url"])
    winners_ds = pairs.groupby("content_hash").min("url")

    def _urls_only(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("min(url)")})

    keep_urls = winners_ds.map_batches(_urls_only, batch_format="pyarrow")
    return semi_join(corpus, keep_urls, "url", num_partitions)


# -- job form: partitioned writes + two-level crash resume -------------------


def _corpus_block_writer(out_dir: str):
    """Writer task for corpus rows: split one batch by url-hash part,
    append one parquet file per (task, part) with a deterministic
    content-hash name (retries rewrite the same file — idempotent), return
    tiny per-part stat rows.  Mirrors extraction's _block_writer; the
    summed per-row crc32 makes partition checksums order- and
    batching-independent."""
    import numpy as np
    import pyarrow.parquet as pq

    def write_block(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks().sort_by("part")
        part_np = batch.column("part").to_numpy()
        rows = {"part": [], "rows": [], "bytes_out": [], "text_checksum": []}
        uniq, starts = np.unique(part_np, return_index=True)
        bounds = list(starts) + [len(batch)]
        for j, part in enumerate(uniq.tolist()):
            sub = batch.slice(bounds[j], bounds[j + 1] - bounds[j])
            token = hashlib.blake2b(
                "\x00".join(sub.column("url").to_pylist()).encode(),
                digest_size=8,
            ).hexdigest()
            pdir = Path(out_dir) / f"part={part}"
            pdir.mkdir(parents=True, exist_ok=True)
            pq.write_table(
                sub.drop_columns(["part"]),
                pdir / f"data-{token}-{len(sub)}.parquet",
                compression="zstd",
            )
            rows["part"].append(int(part))
            rows["rows"].append(len(sub))
            rows["bytes_out"].append(
                pc.sum(sub.column("text_len")).as_py() or 0
            )
            rows["text_checksum"].append(
                (pc.sum(sub.column("text_hash")).as_py() or 0) % (2**63)
            )
        return pa.table(
            {
                "part": pa.array(rows["part"], pa.int32()),
                "rows": pa.array(rows["rows"], pa.int64()),
                "bytes_out": pa.array(rows["bytes_out"], pa.int64()),
                "text_checksum": pa.array(rows["text_checksum"], pa.int64()),
            }
        )

    return write_block


def _write_partitioned(ds, out_dir: str, run_id: str, batch_size: int) -> None:
    """Partitioned corpus write + per-part manifests (shuffle-free: the
    writer splits each batch by the url-hash `part` column; only tiny stat
    rows reach the driver)."""
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    writer_batch = min(max(batch_size * 16, 2048), 65536)
    stats_ds = ds.map_batches(
        _corpus_block_writer(out_dir),
        batch_size=writer_batch,
        batch_format="pyarrow",
    )
    agg: dict[int, dict] = {}
    for row in stats_ds.take_all():  # O(tasks x parts-per-task) tiny rows
        a = agg.setdefault(
            row["part"],
            {"run_id": run_id, "rows": 0, "bytes_out": 0, "text_checksum": 0},
        )
        a["rows"] += row["rows"]
        a["bytes_out"] += row["bytes_out"]
        a["text_checksum"] = (a["text_checksum"] + row["text_checksum"]) % (
            2**63
        )
    for part, stats in agg.items():
        mf.write_manifest(out_dir, part, stats)


def _clean_incomplete(out_dir: str, completed: set[int]) -> None:
    out = Path(out_dir)
    if not out.is_dir():
        return
    for d in out.glob("part=*"):
        try:
            part = int(d.name.split("=", 1)[1])
        except ValueError:
            continue
        if part not in completed:
            shutil.rmtree(d, ignore_errors=True)


def run_corpus(
    input_path,
    out_dir: str,
    min_text_len: int = 30,
    concurrency=None,
    batch_size: int = 256,
    num_parts: int = DEFAULT_NUM_PARTS,
    num_partitions: int | None = None,
    resume: bool = True,
    run_id: str = "run",
    emit_markdown: bool = False,
    emit_metadata: bool = False,
) -> dict:
    """Full crawl-to-corpus job: read -> extract/clean -> checkpoint ->
    global exact dedup -> partitioned write, resumable at two levels.

    Layout (everything under ``out_dir``, i.e. on the job's shared
    storage — the checkpoint is NOT node-local /tmp):

        out/_checkpoint/part=<k>/...   cleaned pre-dedup corpus + manifests
        out/part=<k>/...               deduplicated corpus + manifests

    Resume: (1) checkpoint partitions with manifests are pruned from the
    page READ (`part` is a pure function of url, so skipping completed
    parts loses nothing); (2) final partitions with manifests are skipped,
    and only missing ones are recomputed — against the FULL checkpoint, so
    dedup winners (min url per content hash) are identical to a fresh
    run's and the resumed output is byte-identical."""
    import ray

    t0 = time.monotonic()
    out = Path(out_dir)
    ckpt_dir = str(out / "_checkpoint")
    if not resume and out.exists():
        shutil.rmtree(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # -- stage A: extract + clean into the partitioned checkpoint
    ckpt_done = mf.completed_parts(ckpt_dir) if resume else set()
    _clean_incomplete(ckpt_dir, ckpt_done)
    pages = ray.data.read_parquet(input_path, columns=["url", "html"])
    cleaned = corpus_dataset(
        pages,
        min_text_len=min_text_len,
        concurrency=concurrency,
        batch_size=batch_size,
        dedup=False,
        num_parts=num_parts,
        skip_parts=ckpt_done or None,
        emit_markdown=emit_markdown,
        emit_metadata=emit_metadata,
    )
    if len(ckpt_done) < num_parts:
        _write_partitioned(cleaned, ckpt_dir, run_id, batch_size)

    # -- stage B: global winners over the FULL checkpoint, write only the
    # missing final partitions
    final_done = mf.completed_parts(out_dir) if resume else set()
    _clean_incomplete(out_dir, final_done)
    corpus = ray.data.read_parquet(ckpt_dir)

    def _part_i32(batch: pa.Table) -> pa.Table:
        # hive partitioning re-infers `part`; pin the dtype the writer uses
        i = batch.schema.get_field_index("part")
        return batch.set_column(
            i, "part", pc.cast(batch.column("part"), pa.int32())
        )

    corpus = corpus.map_batches(_part_i32, batch_format="pyarrow")
    if final_done:
        todo = corpus.filter(expr=f"part not in {sorted(final_done)}")
    else:
        todo = corpus
    deduped = _dedup_keep_by_hash_subset(corpus, todo, num_partitions)
    _write_partitioned(deduped, out_dir, run_id, batch_size)

    manifests = [
        m for m in mf.read_manifests(out_dir)
    ]
    roll = {
        "parts": len(manifests),
        "rows": sum(m["rows"] for m in manifests),
        "bytes_out": sum(m["bytes_out"] for m in manifests),
        "wall_s": time.monotonic() - t0,
    }
    return roll


def _dedup_keep_by_hash_subset(full_corpus, subset, num_partitions=None):
    """Winners computed over the FULL corpus; the keep filter applied to
    ``subset`` (the partitions being (re)computed).  With subset == full
    this is exactly ``_dedup_keep_by_hash``."""
    from fuzi_rd.functions.dedup import semi_join

    pairs = full_corpus.select_columns(["content_hash", "url"])
    winners_ds = pairs.groupby("content_hash").min("url")

    def _urls_only(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("min(url)")})

    keep_urls = winners_ds.map_batches(_urls_only, batch_format="pyarrow")
    return semi_join(subset, keep_urls, "url", num_partitions)
