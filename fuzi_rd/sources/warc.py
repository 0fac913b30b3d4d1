"""WARC (Web ARChive, ISO 28500) writer + reader for crawl ingestion.

A 100 TB webtext pipeline's native input is WARC: Common-Crawl-style
segment files, each a concatenation of records

    WARC/1.0<CRLF>
    Header-Name: value<CRLF> ...
    <CRLF>
    <block: Content-Length bytes>
    <CRLF><CRLF>

where ``.warc.gz`` files are a concatenation of *independently gzipped*
records (that per-member framing is what makes the format seekable; here
the parallelism unit is the FILE, mirroring Common Crawl's ~1 GB segments,
so Ray Data's ``read_binary_files`` gives one task per segment and the
record scan stays inside the task).

The reader is robust the way a crawl consumer must be: it resyncs on the
``WARC/1.`` magic after a malformed record, tolerates LF-only headers,
skips non-response records, and strips HTTP envelope headers from
``application/http`` blocks.  The writer is deterministic (content is a
pure function of the input rows), which makes the ``warc_ingest`` query
oracle-checkable: documents round-tripped through WARC segments must come
back byte-identical.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib

import pyarrow as pa

__all__ = [
    "make_warc",
    "iter_warc_records",
    "parse_warc_batch",
    "read_warc_dataset",
]

_CRLF = b"\r\n"
_MAGIC_RE = re.compile(rb"WARC/\d+\.\d+\r?\n")


# ---------------------------------------------------------------------------
# writer


def _http_response(payload: bytes, content_type: str) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: " + content_type.encode("ascii") + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload
    )


def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = b"WARC/1.0\r\n"
    for k, v in headers:
        head += k.encode("ascii") + b": " + v.encode("ascii") + b"\r\n"
    head += b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
    return head + block + b"\r\n\r\n"


def make_warc(
    records: list[dict],
    compress: bool = False,
    warcinfo: str = "software: fuzi_rd synth",
) -> bytes:
    """Serialize records to one WARC segment.

    Each record dict: ``url`` (str), ``date`` (ISO-8601 str), ``payload``
    (bytes), optional ``content_type`` (default text/plain).  ``compress``
    writes the standard per-record-gzip-member ``.warc.gz`` framing.
    """
    out = []
    info_block = warcinfo.encode("utf-8")
    out.append(
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", "2026-01-02T00:00:00Z"),
                ("Content-Type", "application/warc-fields"),
            ],
            info_block,
        )
    )
    for r in records:
        payload = r["payload"]
        ctype = r.get("content_type", "text/plain; charset=utf-8")
        block = _http_response(payload, ctype)
        out.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", r["url"]),
                    ("WARC-Date", r["date"]),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                block,
            )
        )
    if compress:
        # one gzip member per record (mtime=0: byte-deterministic output)
        buf = io.BytesIO()
        for rec in out:
            gz = gzip.GzipFile(fileobj=buf, mode="wb", mtime=0)
            gz.write(rec)
            gz.close()
        return buf.getvalue()
    return b"".join(out)


# ---------------------------------------------------------------------------
# reader


# decompression-bomb guard: segments are ~1 GB compressed and 3-5x that
# decompressed; a member expanding past this is hostile, and a task heap
# could not hold it anyway
_MAX_SEGMENT_BYTES = 8 * 1024 * 1024 * 1024


def _gunzip_members(data: bytes, max_bytes: int = _MAX_SEGMENT_BYTES) -> bytes:
    """Decompress a concatenation of gzip members (or pass through).
    Truncated/corrupt tail members and output past ``max_bytes`` drop the
    tail but keep every fully-decoded record before it."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    budget = max_bytes
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data, budget)
        except zlib.error:
            break  # truncated/corrupt tail member: keep what decoded
        if d.unconsumed_tail:
            break  # output cap hit mid-member: bomb guard
        out.append(chunk)
        budget -= len(chunk)
        data = d.unused_data
        if not d.eof or budget <= 0:
            break
    return b"".join(out)


def iter_warc_records(data: bytes):
    """Yield dicts for every parseable record; resync after bad ones.

    Yields: ``{"type", "url", "date", "headers", "block"}`` with ``block``
    the raw record block (HTTP envelope NOT yet stripped).
    """
    data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        m = _MAGIC_RE.search(data, pos)
        if not m:
            return
        hdr_end = data.find(b"\r\n\r\n", m.end())
        lf_end = data.find(b"\n\n", m.end())
        if hdr_end == -1 and lf_end == -1:
            return
        if hdr_end == -1 or (lf_end != -1 and lf_end < hdr_end):
            hdr_end, sep = lf_end, 2
        else:
            sep = 4
        headers: dict[str, str] = {}
        for line in data[m.end() : hdr_end].splitlines():
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + sep  # resync: scan for the next magic
            continue
        start = hdr_end + sep
        if start + length > n:
            return  # truncated final record
        yield {
            "type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "headers": headers,
            "block": data[start : start + length],
        }
        pos = start + length


def _strip_http(block: bytes) -> bytes:
    """Payload of an application/http block (headers dropped)."""
    if block[:5] in (b"HTTP/", b"GET /", b"POST ", b"HEAD "):
        end = block.find(b"\r\n\r\n")
        if end != -1:
            return block[end + 4 :]
    return block


def parse_warc_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn over ``read_binary_files(include_paths=True)``
    rows: one input row per segment file -> one output row per response
    record.  Row expansion happens inside the task, so a 1 GB segment
    never round-trips through the driver."""
    paths = batch.column("path").to_pylist()
    blobs = batch.column("bytes").to_pylist()
    urls: list[str] = []
    dates: list[str] = []
    payloads: list[bytes] = []
    segments: list[str] = []
    for path, blob in zip(paths, blobs):
        for rec in iter_warc_records(blob or b""):
            if rec["type"] != "response":
                continue
            urls.append(rec["url"])
            dates.append(rec["date"])
            payloads.append(_strip_http(rec["block"]))
            segments.append(path)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_date": pa.array(dates, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "segment": pa.array(segments, pa.string()),
        }
    )


DOC_URL_PREFIX = "https://docs.example.com/doc/"


def write_warc_segments_from_documents(
    documents_parquet: str, out_dir: str, n_shards: int = 16
) -> str:
    """Test-fixture generator: shard ``documents.parquet`` into WARC
    segment files (half of them per-record-gzip ``.warc.gz``).  Idempotent
    and deterministic, like sources/pages.py — a done-marker skips rewrites.
    Driver-side by design: this synthesizes the INPUT a real pipeline would
    already have on storage; it is not a pipeline stage.
    """
    import os
    import pathlib

    import pyarrow.parquet as pq

    out = pathlib.Path(out_dir)
    marker = out / ".complete"
    if marker.exists():
        return out_dir
    out.mkdir(parents=True, exist_ok=True)
    tbl = pq.read_table(documents_parquet, columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    shards: list[list[dict]] = [[] for _ in range(n_shards)]
    for d, t in zip(ids, texts):
        shards[int(d) % n_shards].append(
            {
                "url": f"{DOC_URL_PREFIX}{d}",
                "date": "2026-01-02T00:00:00Z",
                "payload": (t or "").encode("utf-8"),
            }
        )
    for s, records in enumerate(shards):
        compress = s % 2 == 1
        ext = "warc.gz" if compress else "warc"
        path = out / f"segment-{s:05d}.{ext}"
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(make_warc(records, compress=compress))
        os.replace(tmp, path)
    marker.touch()
    return out_dir


def read_warc_dataset(paths):
    """WARC segment files/dir -> Dataset of (url, warc_date, payload,
    segment).  One read task per segment file (the Common-Crawl sharding
    unit); ``batch_size=1`` keeps at most one raw segment per task heap.
    """
    import ray

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse_warc_batch, batch_format="pyarrow", batch_size=1)
