"""Incremental-crawl extraction (fuzi_rd.pipelines.incremental).

The invariant: incremental output ≡ from-scratch extraction of the new
snapshot, byte for byte, for any mix of added/removed/changed/same pages.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from fuzi_rd.sources.pages import row_for_seq


def _snapshot(seqs, mutate=frozenset()):
    """Deterministic page table from the fixture generator; pages in
    ``mutate`` get a content-visible suffix injected before </body>."""
    urls, htmls = [], []
    for s in seqs:
        url, _ts, html, _text, _lang = row_for_seq(s)
        if s in mutate:
            html = html.replace(
                b"</body>", b"<p>updated in crawl 2 with extra words</p></body>"
            )
        urls.append(url)
        htmls.append(html)
    return pa.table(
        {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
    )


def _canon(rows):
    # parse_us is wall-clock timing — the only legitimately nondeterministic
    # output column
    return sorted(
        (
            tuple(
                sorted(
                    ((k, v) for k, v in r.items() if k != "parse_us"),
                    key=lambda kv: kv[0],
                )
            )
            for r in rows
        ),
        key=str,
    )


@pytest.fixture(scope="module")
def snapshots():
    old_seqs = [s for s in range(60) if s % 3 != 2]
    new_seqs = [s for s in range(60) if s % 3 != 0]
    mutate = frozenset(s for s in new_seqs if s % 5 == 0)
    return _snapshot(old_seqs), _snapshot(new_seqs, mutate)


def test_incremental_matches_scratch(ray_session, snapshots):
    import ray

    from fuzi_rd.pipelines.extraction import extract_dataset
    from fuzi_rd.pipelines.incremental import incremental_extract

    old_tbl, new_tbl = snapshots
    prev_pages = ray.data.from_arrow(old_tbl)
    new_pages = ray.data.from_arrow(new_tbl)
    prev_extracted = extract_dataset(
        ray.data.from_arrow(old_tbl), batch_size=8
    ).materialize()

    result, classes = incremental_extract(
        prev_pages,
        new_pages,
        prev_extracted,
        extract=lambda ds: extract_dataset(ds, batch_size=8),
    )
    got = result.take_all()
    want = extract_dataset(ray.data.from_arrow(new_tbl), batch_size=8).take_all()
    assert _canon(got) == _canon(want)

    # classification sanity: every url in either snapshot, each class present
    cls = {r["url"]: r["change"] for r in classes.take_all()}
    old_urls = set(old_tbl.column("url").to_pylist())
    new_urls = set(new_tbl.column("url").to_pylist())
    assert set(cls) == old_urls | new_urls
    assert {c for c in cls.values()} == {"added", "removed", "changed", "same"}
    # changed = mutated pages present in both snapshots
    n_changed = sum(1 for c in cls.values() if c == "changed")
    assert n_changed == len(
        [u for u in (old_urls & new_urls) if cls[u] == "changed"]
    )
    assert n_changed > 0


def test_incremental_all_same_reuses_everything(ray_session, snapshots):
    """Identical snapshots: nothing flows through the extractor."""
    import ray

    from fuzi_rd.pipelines.extraction import extract_dataset
    from fuzi_rd.pipelines.incremental import incremental_extract

    old_tbl, _ = snapshots
    prev_extracted = extract_dataset(
        ray.data.from_arrow(old_tbl), batch_size=8
    ).materialize()

    calls = []

    def counting_extract(ds):
        out = extract_dataset(ds, batch_size=8).materialize()
        calls.append(out.count())
        return out

    result, classes = incremental_extract(
        ray.data.from_arrow(old_tbl),
        ray.data.from_arrow(old_tbl),
        prev_extracted,
        extract=counting_extract,
    )
    assert result.count() == old_tbl.num_rows
    assert all(c == "same" for c in
               (r["change"] for r in classes.take_all()))
    # the extractor is never invoked when nothing changed
    assert calls == []


def test_nested_semi_join_keeps_nested_payload(ray_session):
    import ray

    from fuzi_rd.functions.relational import nested_semi_join

    payload = pa.table(
        {
            "k": pa.array(["a", "b", "c"], pa.string()),
            "spans": pa.array(
                [[{"s": 1}], [], [{"s": 3}, {"s": 4}]],
                pa.list_(pa.struct([("s", pa.int64())])),
            ),
        }
    )
    keys = pa.table({"k": pa.array(["b", "c", "zzz"], pa.string())})
    out = nested_semi_join(
        ray.data.from_arrow(payload), ray.data.from_arrow(keys), "k"
    ).take_all()
    got = {r["k"]: r["spans"] for r in out}
    assert got == {"b": [], "c": [{"s": 3}, {"s": 4}]}
