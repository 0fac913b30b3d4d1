"""WARC writer/reader (sources/warc.py) and the segment-file ingestion path."""

from __future__ import annotations

import gzip

import pytest

from fuzi_rd.sources.warc import (
    DOC_URL_PREFIX,
    iter_warc_records,
    make_warc,
    parse_warc_batch,
    write_warc_segments_from_documents,
)


def _recs(n=5):
    return [
        {
            "url": f"{DOC_URL_PREFIX}{i}",
            "date": "2026-01-02T00:00:00Z",
            "payload": f"payload {i} with\nnewlines and unicode café {i}".encode(),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(compress):
    data = make_warc(_recs(), compress=compress)
    got = [r for r in iter_warc_records(data) if r["type"] == "response"]
    assert len(got) == 5
    for i, r in enumerate(got):
        assert r["url"] == f"{DOC_URL_PREFIX}{i}"
        assert r["block"].endswith(f"unicode café {i}".encode())
        assert r["block"].startswith(b"HTTP/1.1 200 OK")


def test_warcinfo_record_present_and_skippable():
    data = make_warc(_recs(1))
    types = [r["type"] for r in iter_warc_records(data)]
    assert types == ["warcinfo", "response"]


def test_gzip_member_per_record():
    # standard .warc.gz framing: each record its own gzip member
    data = make_warc(_recs(3), compress=True)
    members = 0
    pos = 0
    while (pos := data.find(b"\x1f\x8b", pos)) != -1:
        members += 1
        pos += 2
    assert members >= 4  # warcinfo + 3 responses (payload may add hits)
    # single-shot gzip.decompress only yields the first member unless the
    # lib loops members; our reader must get all records regardless
    got = [r for r in iter_warc_records(data) if r["type"] == "response"]
    assert len(got) == 3


def test_resync_after_malformed_record():
    good = make_warc(_recs(2))
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nonsense\r\n\r\njunk"
    data = bad + good
    got = [r for r in iter_warc_records(data) if r["type"] == "response"]
    assert len(got) == 2


def test_truncated_final_record():
    data = make_warc(_recs(3))
    cut = data[: len(data) - 20]  # clip into the last record's block
    got = [r for r in iter_warc_records(cut) if r["type"] == "response"]
    assert len(got) == 2  # the truncated one is dropped, not mangled


def test_lf_only_headers():
    # some producers emit LF-only framing; Content-Length still governs
    block = b"hello lf world"
    data = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Target-URI: " + DOC_URL_PREFIX.encode() + b"0\n"
        b"Content-Length: " + str(len(block)).encode() + b"\n\n"
        + block
        + b"\n\n"
    )
    got = [r for r in iter_warc_records(data) if r["type"] == "response"]
    assert len(got) == 1
    assert got[0]["url"] == f"{DOC_URL_PREFIX}0"
    assert got[0]["block"] == block


def test_gzip_bomb_guard():
    import io
    import zlib as _zlib

    from fuzi_rd.sources.warc import _gunzip_members

    # a member expanding past max_bytes drops the tail, keeps prior members
    good = make_warc(_recs(1), compress=True)
    buf = io.BytesIO(good)
    buf.seek(0, 2)
    gz = gzip.GzipFile(fileobj=buf, mode="wb", mtime=0)
    gz.write(b"\x00" * (4 * 1024 * 1024))
    gz.close()
    data = buf.getvalue()
    out = _gunzip_members(data, max_bytes=1024 * 1024)
    recs = [r for r in iter_warc_records(out) if r["type"] == "response"]
    assert len(recs) == 1  # the good member survived; the bomb was dropped
    assert len(out) < 1024 * 1024 + 1


def test_corrupt_gzip_tail_keeps_decoded_prefix():
    data = make_warc(_recs(4), compress=True)
    cut = data[: len(data) - 15]  # corrupt the final member
    got = [r for r in iter_warc_records(cut) if r["type"] == "response"]
    assert 2 <= len(got) <= 3


def test_parse_warc_batch_strips_http():
    import pyarrow as pa

    blob = make_warc(_recs(3))
    batch = pa.table(
        {"path": ["seg-0"], "bytes": pa.array([blob], pa.large_binary())}
    )
    out = parse_warc_batch(batch)
    assert out.num_rows == 3
    assert out.column("payload")[0].as_py().startswith(b"payload 0")
    assert set(out.column("segment").to_pylist()) == {"seg-0"}


def test_segment_fixture_writer_and_ray_ingest(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from fuzi_rd.sources.warc import read_warc_dataset

    texts = [f"doc body {i}\nline two {i}" for i in range(40)]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(40), pa.int64()), "text": texts}
        ),
        tmp_path / "documents.parquet",
    )
    seg_dir = write_warc_segments_from_documents(
        str(tmp_path / "documents.parquet"), str(tmp_path / "segs"), n_shards=4
    )
    # idempotent: second call must not rewrite (marker present)
    assert write_warc_segments_from_documents(
        str(tmp_path / "documents.parquet"), seg_dir, n_shards=4
    ) == seg_dir

    ds = read_warc_dataset(seg_dir)
    tbl = pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs() if ray.get(r).num_rows]
    )
    assert tbl.num_rows == 40
    by_url = dict(
        zip(tbl.column("url").to_pylist(), tbl.column("payload").to_pylist())
    )
    for i in range(40):
        assert by_url[f"{DOC_URL_PREFIX}{i}"].decode() == texts[i]
