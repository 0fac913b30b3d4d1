"""Pipeline-level tests: byte-identity of the distributed extraction vs the
single-document engine, partitioned output layout, lineage manifests, and
crash-resume (FIXTURES.md §5 / SURVEY.md §5.2)."""

import shutil

import pytest

from fuzi_rd.extract import extract_from_html
from fuzi_rd.sources.pages import row_for_seq, write_pages_parquet
from fuzi_rd.state import manifest as mf

N_ROWS = 120
NUM_PARTS = 8


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    write_pages_parquet(str(d), N_ROWS, rows_per_file=40)
    return str(d)


@pytest.fixture(scope="module")
def extracted(ray_session, pages_dir, tmp_path_factory):
    from fuzi_rd.pipelines.extraction import run_extraction

    out = str(tmp_path_factory.mktemp("out") / "run1")
    roll = run_extraction(
        pages_dir, out, num_parts=NUM_PARTS, resume=False, batch_size=16
    )
    return out, roll


def test_rollup_counts(extracted):
    _, roll = extracted
    assert roll["rows"] == N_ROWS
    assert roll["ok_rows"] == N_ROWS
    assert roll["error_rows"] == 0


def test_byte_identity_vs_single_doc(ray_session, extracted):
    """The distributed pipeline's extracted_text must be byte-identical per
    url to the single-document engine run driver-side on the same html
    (the north_rule correctness invariant, applied to our own engine)."""
    import ray

    out, _ = extracted
    got = {
        r["url"]: (r["extracted_text"], r["title"], r["spans"])
        for r in ray.data.read_parquet(out).take_all()
    }
    assert len(got) == N_ROWS
    for seq in range(N_ROWS):
        url, _, html, _, _ = row_for_seq(seq)
        expected = extract_from_html(html)
        assert got[url][0] == expected["extracted_text"], url
        assert got[url][1] == expected["title"], url
        # spans survive the arrow/parquet round trip byte-for-byte, with
        # utf-8 byte offsets in bounds
        assert got[url][2] == expected["spans"], url
        n = len(expected["extracted_text"].encode("utf-8"))
        for s in got[url][2]:
            assert 0 <= s["start"] <= s["end"] <= n


def test_manifests_complete(extracted):
    out, _ = extracted
    manifests = mf.read_manifests(out)
    assert len(manifests) == NUM_PARTS
    assert sum(m["rows"] for m in manifests) == N_ROWS
    for m in manifests:
        assert m["text_checksum"] >= 0
        assert m["run_id"]


def test_resume_recomputes_only_missing(ray_session, extracted, tmp_path):
    """Simulate a crash: drop two partitions' manifests + data, re-run with
    resume=True, and require the final output to match a fresh run exactly."""
    import ray

    from fuzi_rd.pipelines.extraction import run_extraction

    out, _ = extracted
    crash = str(tmp_path / "crashed")
    shutil.copytree(out, crash)

    victims = [0, 3]
    for part in victims:
        (mf.manifest_dir(crash) / f"part-{part}.json").unlink()
        shutil.rmtree(f"{crash}/part={part}")
    # one partition crashed mid-write: data present but no manifest
    half = 5
    (mf.manifest_dir(crash) / f"part-{half}.json").unlink()

    before = mf.completed_parts(crash)
    assert set(victims) | {half} == set(range(NUM_PARTS)) - before

    # pages_dir is recomputed deterministically from the same fixture module
    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, N_ROWS, rows_per_file=40)
    roll = run_extraction(pages, crash, num_parts=NUM_PARTS, resume=True)
    assert roll["rows"] == N_ROWS

    want = {
        r["url"]: r["extracted_text"] for r in ray.data.read_parquet(out).take_all()
    }
    got = {
        r["url"]: r["extracted_text"] for r in ray.data.read_parquet(crash).take_all()
    }
    assert got == want  # no missing rows, no duplicates, identical bytes
    assert len(mf.read_manifests(crash)) == NUM_PARTS


def test_skew_routing_branch(ray_session, tmp_path):
    """Oversized pages go down the batch_size=1 branch; results identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from fuzi_rd.pipelines.extraction import extract_dataset

    big_body = b"<p>" + b"huge page content word " * 20000 + b"</p>"
    tbl = pa.table(
        {
            "url": [f"https://x.test/{i}" for i in range(10)]
            + ["https://x.test/huge"],
            "html": [
                b"<html><body><p>small page with plenty of content text</p></body></html>"
            ]
            * 10
            + [b"<html><body>" + big_body + b"</body></html>"],
        }
    )
    p = tmp_path / "skew.parquet"
    pq.write_table(tbl, p)
    ds = ray.data.read_parquet(str(p))
    rows = {
        r["url"]: r
        for r in extract_dataset(
            ds, concurrency=(1, 2), skew_threshold=10_000
        ).take_all()
    }
    assert len(rows) == 11
    assert rows["https://x.test/huge"]["status"] == "ok"
    assert rows["https://x.test/huge"]["text_len"] > 100_000


def test_error_rows_do_not_poison(ray_session, tmp_path):
    """A row whose html explodes the parser becomes status='error'; the rest
    of its batch is unaffected (SURVEY.md §4.2 poison-pill tolerance)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from fuzi_rd.pipelines.extraction import extract_dataset

    tbl = pa.table(
        {
            "url": ["https://x.test/ok", "https://x.test/empty", "https://x.test/ok2"],
            "html": [b"<html><body><p>" + b"good content here " * 10 + b"</p></body></html>", b"", b"<html><body>fine</body></html>"],
        }
    )
    p = tmp_path / "in.parquet"
    pq.write_table(tbl, p)
    ds = ray.data.read_parquet(str(p))
    rows = {r["url"]: r for r in extract_dataset(ds, concurrency=(1, 1)).take_all()}
    assert rows["https://x.test/empty"]["status"] == "error"
    assert rows["https://x.test/ok"]["status"] == "ok"
    assert "good content here" in rows["https://x.test/ok"]["extracted_text"]


def test_page_generator_frozen():
    """The bench page tables are cached on disk keyed only by row count —
    if generator output ever drifts, those caches go silently stale.  This
    fingerprint freezes the generators; if you change them intentionally,
    update the crc AND delete /tmp/fuzi_rd_*pages* caches."""
    import zlib

    from fuzi_rd.sources.pages import pages_table, skew_pages_table

    t = pages_table(500, start=0)
    assert zlib.crc32(b"".join(t.column("html").to_pylist())) == 2508026150
    s = skew_pages_table(600, start=0, huge_every=500)
    assert zlib.crc32(b"".join(s.column("html").to_pylist())) == 3265379870


def test_extraction_heuristic_goldens_frozen():
    """Frozen snapshots of the density-heuristic outputs (SURVEY.md §7 step
    6): engine-produced once, reviewed, committed.  Catches regressions the
    pipeline-vs-engine byte-identity test cannot (there both sides drift
    together).  If extraction SEMANTICS change intentionally, regenerate
    tests/fixtures/extraction_goldens.json and review the diff."""
    import json
    import pathlib
    import zlib

    goldens = json.loads(
        (pathlib.Path(__file__).parent / "fixtures" / "extraction_goldens.json")
        .read_text()
    )

    def check(name, html):
        want = goldens[name]
        got = extract_from_html(html)
        assert got["title"] == want["title"], name
        assert len(got["extracted_text"]) == want["text_len"], name
        assert zlib.crc32(got["extracted_text"].encode()) == want["text_crc32"], name
        assert len(got["spans"]) == want["n_spans"], name
        if want["first_span"]:
            assert got["spans"][0] == want["first_span"], name
        assert got["extracted_text"][:160] == want["text_head"], name

    check(
        "web.html",
        (pathlib.Path(__file__).parent / "fixtures" / "web.html").read_bytes(),
    )
    for name in goldens:
        if name.startswith("seq"):
            seq = int(name[3:])
            url, _, html, _, _ = row_for_seq(seq)
            assert url == goldens[name]["url"]
            check(name, html)


def test_resume_prunes_input_partitions(ray_session, tmp_path):
    """VERDICT r2 item 10: with a part=<k> url-hash input layout (our own
    writer's), a resumed run prunes completed partitions at the READ.
    Proof: completed parts' input files are corrupted after the first run —
    an unpruned read would crash; the pruned resume never opens them."""
    import pyarrow.parquet as pq
    import ray

    from fuzi_rd.pipelines.extraction import run_extraction
    from fuzi_rd.sources.pages import pages_table
    from fuzi_rd.stages.extractor import url_part

    # partitioned input: pages laid out by url-hash part (same num_parts)
    inp = tmp_path / "pages_parted"
    tbl = pages_table(N_ROWS)
    parts = [url_part(u, NUM_PARTS) for u in tbl.column("url").to_pylist()]
    import pyarrow as pa

    tbl = tbl.append_column("part", pa.array(parts, pa.int32()))
    for k in sorted(set(parts)):
        sub = tbl.filter(pa.compute.equal(tbl.column("part"), k))
        d = inp / f"part={k}"
        d.mkdir(parents=True)
        pq.write_table(sub.drop_columns(["part"]), d / "data.parquet")

    out = str(tmp_path / "out")
    roll = run_extraction(
        str(inp), out, num_parts=NUM_PARTS, resume=False, batch_size=16,
        input_partitioned=True,
    )
    assert roll["rows"] == N_ROWS
    want = {
        r["url"]: r["extracted_text"]
        for r in ray.data.read_parquet(out).take_all()
    }

    victims = sorted(mf.completed_parts(out))[:2]
    for part in victims:
        (mf.manifest_dir(out) / f"part-{part}.json").unlink()
        shutil.rmtree(f"{out}/part={part}")
    # poison every COMPLETED part's input: reading any of them now fails
    for d in (inp).glob("part=*"):
        k = int(d.name.split("=", 1)[1])
        if k not in victims:
            (d / "data.parquet").write_bytes(b"corrupted, not parquet")

    roll2 = run_extraction(
        str(inp), out, num_parts=NUM_PARTS, resume=True, batch_size=16,
        input_partitioned=True,
    )
    assert roll2["rows"] == N_ROWS
    got = {
        r["url"]: r["extracted_text"]
        for r in ray.data.read_parquet(out).take_all()
    }
    assert got == want

    # fully-complete resume short-circuits without touching the input
    roll3 = run_extraction(
        str(inp), out, num_parts=NUM_PARTS, resume=True,
        input_partitioned=True,
    )
    assert roll3["rows"] == N_ROWS


def test_corpus_job_resume_byte_identity(ray_session, pages_dir, tmp_path):
    """Corpus-level crash resume (VERDICT r2 item 2): kill checkpoint and
    final partitions mid-run, resume, and require manifests + rows to be
    byte-identical to the uninterrupted run.  The checkpoint lives under
    the job's output dir (shared storage), not node-local /tmp."""
    import ray

    from fuzi_rd.pipelines.corpus import run_corpus

    fresh = str(tmp_path / "fresh")
    roll = run_corpus(
        pages_dir, fresh, num_parts=NUM_PARTS, resume=False, batch_size=16
    )
    assert roll["rows"] > 0
    assert (mf.manifest_dir(f"{fresh}/_checkpoint")).is_dir()

    crash = str(tmp_path / "crashed")
    shutil.copytree(fresh, crash)
    # crash scenario: one checkpoint part lost, two final parts lost, one
    # final part half-written (data present, manifest missing)
    ck = f"{crash}/_checkpoint"
    ck_parts = sorted(mf.completed_parts(ck))
    victim_ck = ck_parts[0]
    (mf.manifest_dir(ck) / f"part-{victim_ck}.json").unlink()
    shutil.rmtree(f"{ck}/part={victim_ck}")
    out_parts = sorted(mf.completed_parts(crash))
    for part in out_parts[:2]:
        (mf.manifest_dir(crash) / f"part-{part}.json").unlink()
        shutil.rmtree(f"{crash}/part={part}")
    if len(out_parts) > 3:
        (mf.manifest_dir(crash) / f"part-{out_parts[3]}.json").unlink()

    roll2 = run_corpus(
        pages_dir, crash, num_parts=NUM_PARTS, resume=True, batch_size=16
    )
    assert roll2["rows"] == roll["rows"]

    want_manifests = {
        m["part"]: (m["rows"], m["text_checksum"])
        for m in mf.read_manifests(fresh)
    }
    got_manifests = {
        m["part"]: (m["rows"], m["text_checksum"])
        for m in mf.read_manifests(crash)
    }
    assert got_manifests == want_manifests

    want = {
        r["url"]: r["extracted_text"]
        for r in ray.data.read_parquet(fresh).take_all()
    }
    got = {
        r["url"]: r["extracted_text"]
        for r in ray.data.read_parquet(crash).take_all()
    }
    assert got == want  # no missing rows, no duplicates, identical bytes


def test_corpus_checkpoint_dir_cleared(ray_session, pages_dir, tmp_path):
    """A non-empty explicit checkpoint_dir is cleared before writing so
    stale files from a prior run can't be re-read as duplicate documents
    (ADVICE r2)."""
    import ray

    from fuzi_rd.pipelines.corpus import corpus_dataset

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "stale.parquet").write_bytes(b"not a real file")
    ds = ray.data.read_parquet(pages_dir, columns=["url", "html"])
    rows = corpus_dataset(
        ds, batch_size=16, checkpoint_dir=str(ckpt)
    ).take_all()
    assert 0 < len(rows) <= N_ROWS
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls)
    assert not (ckpt / "stale.parquet").exists()


def test_corpus_pipeline_composition(ray_session, pages_dir):
    """Composed corpus pipeline: extracted + gated + deduplicated rows with
    the full annotation schema; urls unique; hashes consistent."""
    import hashlib

    import ray

    from fuzi_rd.pipelines.corpus import corpus_dataset

    ds = ray.data.read_parquet(pages_dir, columns=["url", "html"])
    rows = corpus_dataset(ds, batch_size=16).take_all()
    assert 0 < len(rows) <= N_ROWS
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls)
    hashes = [r["content_hash"] for r in rows]
    assert len(set(hashes)) == len(hashes)  # dedup by extracted text held
    for r in rows[:20]:
        url, _, html, _, _ = row_for_seq(int(r["url"].rsplit("/", 1)[1]))
        assert url == r["url"]
        expected = extract_from_html(html)["extracted_text"]
        assert r["content_hash"] == hashlib.md5(expected.encode()).hexdigest()


def test_corpus_fused_markdown_metadata_identity(ray_session, pages_dir):
    """VERDICT r3 item 9: the opt-in markdown + metadata columns emitted by
    the corpus job (one parse pass inside the extraction actor pool) are
    byte-identical to the standalone ConvertMarkdown / ExtractMetadata
    stages."""
    import ray

    from fuzi_rd.pipelines.corpus import corpus_dataset
    from fuzi_rd.stages.markdown import markdown_dataset
    from fuzi_rd.stages.metadata import extract_metadata_dataset

    def _pages():
        return ray.data.read_parquet(pages_dir, columns=["url", "html"])

    fused = {
        r["url"]: r
        for r in corpus_dataset(
            _pages(), batch_size=16, emit_markdown=True, emit_metadata=True
        ).take_all()
    }
    assert fused
    md = {r["url"]: r for r in markdown_dataset(_pages(), batch_size=16).take_all()}
    meta = {
        r["url"]: r
        for r in extract_metadata_dataset(_pages(), batch_size=16).take_all()
    }
    pairs = {
        "meta_title": "title",
        "meta_description": "meta_description",
        "canonical_url": "canonical_url",
        "meta_lang": "lang",
        "robots_noindex": "robots_noindex",
        "robots_nofollow": "robots_nofollow",
        "og_title": "og_title",
        "og_description": "og_description",
        "og_image": "og_image",
        "og_type": "og_type",
    }
    for url, r in fused.items():
        assert r["markdown"] == md[url]["markdown"]
        for fused_col, standalone_col in pairs.items():
            assert r[fused_col] == meta[url][standalone_col], (url, fused_col)


def test_curation_stage(ray_session):
    """curate_dataset: signal gates drop degenerate docs, the blocklist
    drops its domains, and the per-stratum quota keeps small strata whole."""
    import pyarrow as pa
    import ray

    from fuzi_rd.pipelines.curation import curate_dataset

    prose = (
        "The quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing different songs about distant mountain weather. "
    )
    rows = []
    for i in range(30):
        rows.append(
            {
                "url": f"https://site{i % 3}.example.com/p/{i}",
                "extracted_text": f"{prose} Variation token v{i} ends here.",
                "lang_guess": "en" if i % 2 == 0 else "de",
            }
        )
    # degenerate docs that the signal gates must drop
    rows.append(
        {
            "url": "https://site0.example.com/spam",
            "extracted_text": "buy now " * 200,  # compresses to ~nothing
            "lang_guess": "en",
        }
    )
    rows.append(
        {
            "url": "https://blocked.example.net/x",
            "extracted_text": f"{prose} Blocked domain doc body here.",
            "lang_guess": "en",
        }
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": [r["url"] for r in rows],
                "extracted_text": [r["extracted_text"] for r in rows],
                "lang_guess": [r["lang_guess"] for r in rows],
            }
        )
    )
    out = curate_dataset(
        ds, cap=1000, blocklist=["example.net"]
    ).take_all()
    urls = {r["url"] for r in out}
    assert "https://site0.example.com/spam" not in urls  # gate
    assert "https://blocked.example.net/x" not in urls  # blocklist
    assert len(out) == 30  # cap >> strata sizes: every clean doc kept
    assert all(r["domain"] == "example.com" for r in out)
    assert all(200 <= r["compress_milli"] <= 950 for r in out)
