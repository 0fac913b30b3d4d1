"""Per-partition lineage manifests and resume.

The reference has no persistence at all; the north_rule requires each
partition to write lineage + metrics so a failed run resumes from checkpoint
(BASELINE.json `north_rule`; SURVEY.md §4.2).

Layout (next to the partitioned Parquet output):

    out/part=<k>/...parquet          data for url-hash partition k
    out/_manifests/part-<k>.json     written AFTER the data (atomic rename)

A partition is complete iff its manifest exists.  On restart the driver
scans `_manifests/`, prunes completed partitions from the *input* (cheap:
the partition id is a pure function of url), recomputes only the missing
ones and writes their manifests.  Manifest content:

    {run_id, part, rows, ok_rows, error_rows, bytes_in, bytes_out,
     text_checksum}

`text_checksum` is the sum of per-row crc32(extracted_text) mod 2^63 —
order-independent, so it is stable across block orderings and can be
re-aggregated from the output alone.
"""

from __future__ import annotations

import json
import os
import pathlib


def manifest_dir(out_dir: str) -> pathlib.Path:
    return pathlib.Path(out_dir) / "_manifests"


def completed_parts(out_dir: str) -> set[int]:
    d = manifest_dir(out_dir)
    if not d.is_dir():
        return set()
    parts = set()
    for p in d.glob("part-*.json"):
        try:
            parts.add(int(p.stem.split("-", 1)[1]))
        except ValueError:
            continue
    return parts


def write_manifest(out_dir: str, part: int, stats: dict) -> None:
    """Atomic write: temp file + rename, so a manifest never exists
    half-written (the completeness marker must be all-or-nothing)."""
    d = manifest_dir(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    final = d / f"part-{part}.json"
    tmp = d / f".part-{part}.json.tmp"
    with open(tmp, "w") as f:
        json.dump({"part": part, **stats}, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def read_manifests(out_dir: str) -> list[dict]:
    d = manifest_dir(out_dir)
    if not d.is_dir():
        return []
    out = []
    for p in sorted(d.glob("part-*.json")):
        with open(p) as f:
            out.append(json.load(f))
    return out


def rollup(out_dir: str) -> dict:
    """Aggregate all partition manifests into run-level metrics."""
    manifests = read_manifests(out_dir)
    total = {
        "parts": len(manifests),
        "rows": 0,
        "ok_rows": 0,
        "error_rows": 0,
        "bytes_in": 0,
        "bytes_out": 0,
        "parse_us_sum": 0,
    }
    for m in manifests:
        for k in (
            "rows", "ok_rows", "error_rows", "bytes_in", "bytes_out",
            "parse_us_sum",
        ):
            total[k] += m.get(k, 0)
    return total
