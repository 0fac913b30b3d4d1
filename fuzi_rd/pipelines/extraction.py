"""End-to-end extraction pipeline (SURVEY.md §3.4).

    read_parquet (pruned columns, completed partitions skipped)
      -> skew split: oversized html rows routed to a batch_size=1 branch
      -> ExtractPages actor pool (map_batches, zero-copy Arrow)
      -> write_parquet partitioned by url-hash part  (resumable unit)
      -> per-partition lineage manifests + run metrics roll-up

Design notes for 100 TB scale:
  * the hot path is shuffle-free: partition ids are a pure function of url,
    so no repartition/groupby is needed before the partitioned write;
  * resume prunes completed partitions at the READ (cheap vectorized filter)
    so re-runs touch only missing data;
  * the only driver-side materialization is the per-partition stats
    aggregate (O(num_parts) rows) used to write manifests.
"""

from __future__ import annotations

import shutil
import time
import zlib
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

from fuzi_rd.stages.extractor import DEFAULT_NUM_PARTS, ExtractPages
from fuzi_rd.state import manifest as mf

# A single page larger than this is a straggler risk inside a big batch:
# route it to the batch_size=1 branch (SURVEY.md §4.2 "skew / stragglers").
DEFAULT_SKEW_THRESHOLD = 4 * 1024 * 1024

DEFAULT_RECIPE = {
    # Fuzi-parity columns evaluated by the same query core used for tests:
    # CSS selectors are compiled via xpath_from_css in the actor __init__.
    "h1_text": "css: h1",
}


def _with_meta(num_parts: int):
    """Vectorized-ish per-batch computation of html size + url-hash part."""

    def add_meta(batch: pa.Table) -> pa.Table:
        n_bytes = pc.binary_length(batch.column("html"))
        parts = pa.array(
            [zlib.crc32(u.encode()) % num_parts for u in batch.column("url").to_pylist()],
            pa.int32(),
        )
        return batch.append_column("n_bytes", n_bytes).append_column("part", parts)

    return add_meta


def extract_dataset(
    ds,
    recipe: dict | None = None,
    concurrency=None,
    batch_size: int = 32,
    num_parts: int = DEFAULT_NUM_PARTS,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    skip_parts: set[int] | None = None,
):
    """Wire the extraction stages onto an input Dataset (lazy)."""
    import ray

    if concurrency is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(1, n_cpus))

    ds = ds.map_batches(_with_meta(num_parts), batch_format="pyarrow")
    if skip_parts:
        skip_list = sorted(skip_parts)
        ds = ds.filter(expr=f"part not in {skip_list}")

    kwargs = dict(
        fn_constructor_kwargs={"recipe": recipe, "num_parts": num_parts},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    small = ds.filter(expr=f"n_bytes <= {skew_threshold}").map_batches(
        ExtractPages, batch_size=batch_size, **kwargs
    )
    large = ds.filter(expr=f"n_bytes > {skew_threshold}").map_batches(
        ExtractPages, batch_size=1, **kwargs
    )
    return small.union(large)


def run_extraction(
    input_path,
    out_dir: str,
    recipe: dict | None = None,
    concurrency=None,
    batch_size: int = 32,
    num_parts: int = DEFAULT_NUM_PARTS,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    resume: bool = True,
    run_id: str = "run",
) -> dict:
    """Full job: read -> extract -> partitioned write -> manifests.

    Returns the run-level metrics roll-up."""
    import ray

    t0 = time.monotonic()
    out = Path(out_dir)

    completed = mf.completed_parts(out_dir) if resume else set()
    if not resume and out.exists():
        shutil.rmtree(out_dir)
    _clean_incomplete_parts(out_dir, completed, num_parts)

    ds = ray.data.read_parquet(
        input_path, columns=["url", "html"]
    )
    result = extract_dataset(
        ds,
        recipe=recipe,
        concurrency=concurrency,
        batch_size=batch_size,
        num_parts=num_parts,
        skew_threshold=skew_threshold,
        skip_parts=completed,
    )
    result.write_parquet(str(out), partition_cols=["part"])

    _write_manifests(out_dir, exclude=completed, run_id=run_id)
    roll = mf.rollup(out_dir)
    roll["wall_s"] = time.monotonic() - t0
    return roll


def _clean_incomplete_parts(out_dir: str, completed: set[int], num_parts: int):
    """Delete data directories of partitions that have no manifest: they are
    from a crashed run and will be recomputed (prevents duplicate rows)."""
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


def _write_manifests(out_dir: str, exclude: set[int], run_id: str):
    """Aggregate per-partition stats from the written output (a cheap column
    scan — never re-runs extraction) and write one manifest per partition."""
    import ray

    stats_ds = ray.data.read_parquet(
        str(out_dir),
        columns=["part", "status", "html_bytes", "text_len", "text_hash"],
    )

    def agg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = {}
        part_col = batch.column("part").to_pylist()
        status = batch.column("status").to_pylist()
        hb = batch.column("html_bytes").to_pylist()
        tl = batch.column("text_len").to_pylist()
        th = batch.column("text_hash").to_pylist()
        for i, p in enumerate(part_col):
            s = parts.setdefault(int(p), [0, 0, 0, 0, 0, 0])
            s[0] += 1
            if status[i] == "ok":
                s[1] += 1
            else:
                s[2] += 1
            s[3] += hb[i]
            s[4] += tl[i]
            s[5] = (s[5] + th[i]) % (2**64)
        return pa.table(
            {
                "part": pa.array(list(parts), pa.int32()),
                "rows": pa.array([v[0] for v in parts.values()], pa.int64()),
                "ok_rows": pa.array([v[1] for v in parts.values()], pa.int64()),
                "error_rows": pa.array([v[2] for v in parts.values()], pa.int64()),
                "bytes_in": pa.array([v[3] for v in parts.values()], pa.int64()),
                "bytes_out": pa.array([v[4] for v in parts.values()], pa.int64()),
                "checksum": pa.array([v[5] for v in parts.values()], pa.uint64()),
            }
        )

    # partial per-block aggregation, then a tiny final combine on the driver
    # (num_parts rows — never the data itself)
    partial = stats_ds.map_batches(agg, batch_format="pyarrow")
    final: dict[int, list] = {}
    for batch in partial.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            s = final.setdefault(row["part"], [0, 0, 0, 0, 0, 0])
            s[0] += row["rows"]
            s[1] += row["ok_rows"]
            s[2] += row["error_rows"]
            s[3] += row["bytes_in"]
            s[4] += row["bytes_out"]
            s[5] = (s[5] + row["checksum"]) % (2**64)
    for part, s in final.items():
        if part in exclude:
            continue
        mf.write_manifest(
            out_dir,
            part,
            {
                "run_id": run_id,
                "rows": s[0],
                "ok_rows": s[1],
                "error_rows": s[2],
                "bytes_in": s[3],
                "bytes_out": s[4],
                "text_checksum": s[5],
            },
        )
