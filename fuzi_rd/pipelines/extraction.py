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
    skew_threshold: int | None = None,
    skip_parts: set[int] | None = None,
):
    """Wire the extraction stages onto an input Dataset (lazy).

    ``skew_threshold``: when set, rows with ``len(html) > threshold`` are
    routed to a separate batch_size=1 actor-pool branch so one giant
    tag-soup page cannot stall a whole batch of ordinary pages (explicit
    skew handling per SURVEY.md §4.2).  The large branch's pool is sized to
    a fraction of the cluster — both branches must never demand more actors
    than there are CPUs, or the pools deadlock waiting for resources.
    Default None: single stage (per-batch cost is already bounded by
    batch_size; enable routing when the input has a heavy size tail)."""
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    if concurrency is None:
        # autoscaling floor at half the CPUs: a floor of 1 wastes the first
        # seconds ramping up (measured 3x slower on short jobs), while a
        # fixed pool of n_cpus deadlocks the read tasks that feed it
        concurrency = (max(1, n_cpus // 2), max(1, n_cpus))

    ds = ds.map_batches(_with_meta(num_parts), batch_format="pyarrow")
    if skip_parts:
        skip_list = sorted(skip_parts)
        ds = ds.filter(expr=f"part not in {skip_list}")

    kwargs = dict(
        fn_constructor_kwargs={"recipe": recipe, "num_parts": num_parts},
        batch_format="pyarrow",
        num_cpus=1,
    )
    if skew_threshold is None:
        return ds.map_batches(
            ExtractPages, batch_size=batch_size, concurrency=concurrency, **kwargs
        )
    large_conc = (1, max(1, n_cpus // 8))
    small = ds.filter(expr=f"n_bytes <= {skew_threshold}").map_batches(
        ExtractPages, batch_size=batch_size, concurrency=concurrency, **kwargs
    )
    large = ds.filter(expr=f"n_bytes > {skew_threshold}").map_batches(
        ExtractPages, batch_size=1, concurrency=large_conc, **kwargs
    )
    return small.union(large)


def run_extraction(
    input_path,
    out_dir: str,
    recipe: dict | None = None,
    concurrency=None,
    batch_size: int = 32,
    num_parts: int = DEFAULT_NUM_PARTS,
    skew_threshold: int | None = None,
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

    # One writer task per url-hash partition: exactly one parquet file per
    # partition per run (no tiny-file explosion), and per-partition stats
    # come back as the task's return value — no output re-scan needed.
    # The groupby shuffle moves only the *extracted* output, never the html.
    out.mkdir(parents=True, exist_ok=True)
    stats_ds = result.groupby("part").map_groups(
        _part_writer(str(out)), batch_format="pyarrow"
    )
    for row in stats_ds.take_all():  # O(num_parts) rows
        mf.write_manifest(
            out_dir,
            row["part"],
            {
                "run_id": run_id,
                "rows": row["rows"],
                "ok_rows": row["ok_rows"],
                "error_rows": row["error_rows"],
                "bytes_in": row["bytes_in"],
                "bytes_out": row["bytes_out"],
                "text_checksum": row["text_checksum"],
            },
        )
    roll = mf.rollup(out_dir)
    roll["wall_s"] = time.monotonic() - t0
    return roll


def _part_writer(out_dir: str):
    """Writer for one url-hash partition group: writes the partition's data
    file, returns its lineage stats row."""
    import pyarrow.parquet as pq

    def write_part(group: pa.Table) -> pa.Table:
        part = group.column("part")[0].as_py()
        pdir = Path(out_dir) / f"part={part}"
        pdir.mkdir(parents=True, exist_ok=True)
        data = group.drop_columns(["part"])
        path = pdir / "data-0.parquet"
        pq.write_table(data, path, compression="zstd")
        status = group.column("status").to_pylist()
        ok = sum(1 for s in status if s == "ok")
        checksum = sum(group.column("text_hash").to_pylist()) % (2**64)
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "rows": pa.array([len(group)], pa.int64()),
                "ok_rows": pa.array([ok], pa.int64()),
                "error_rows": pa.array([len(group) - ok], pa.int64()),
                "bytes_in": pa.array(
                    [sum(group.column("html_bytes").to_pylist())], pa.int64()
                ),
                "bytes_out": pa.array(
                    [sum(group.column("text_len").to_pylist())], pa.int64()
                ),
                "text_checksum": pa.array([checksum], pa.uint64()),
            }
        )

    return write_part


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


