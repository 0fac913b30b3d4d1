"""Deterministic stratified (per-key quota) sampling.

Web corpora are domain-skewed: a handful of hosts contribute most pages.
Balanced pretraining subsets keep at most ~``cap`` documents per domain,
which a naive global sample can't do.  This is the two-stage broadcast
pattern again:

1. **Quota fit**: ``groupby(key).count()`` — a small shuffle whose output
   is one row per stratum — then per-stratum keep thresholds
   ``min(256, 256 * cap // n)`` (integer math, so the DuckDB oracle is
   exact).  The stratum->threshold dict is bounded by the number of
   domains, NOT corpus size (document-scale guidance: ~10^7 strata ≈ a
   few hundred MB; cap the stratum cardinality upstream if it exceeds
   that).
2. **Filter**: thresholds ship once via ``ray.put``; each task keeps rows
   whose ``md5(id)`` first byte falls under its stratum's threshold — the
   same deterministic no-RNG rule as the global ``doc_sample`` query, so
   the kept set is stable across runs, engines, batch sizes and cluster
   shapes.

Expectation semantics: each stratum keeps ``≈ n * thr / 256`` rows (the
md5 byte is uniform), i.e. ``≈ cap`` for large strata and everything for
strata smaller than the cap.  Exact-count quotas would need a per-stratum
sort — a full shuffle this avoids on purpose.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

__all__ = ["stratified_sample_keep"]


def stratified_sample_keep(
    ds,
    key_col: str,
    id_col: str = "doc_id",
    cap: int = 30,
):
    """Keep ~``cap`` rows per ``key_col`` stratum; returns a Dataset."""
    import ray

    counts = ds.groupby(key_col).count()
    thresholds = {
        r[key_col]: min(256, (256 * cap) // max(int(r["count()"]), 1))
        for r in counts.iter_rows()
    }
    thr_ref = ray.put(thresholds)

    def keep(batch: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        keys = batch.column(key_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        mask = pa.array(
            [
                hashlib.md5(str(i).encode()).digest()[0] < thr.get(k, 0)
                for i, k in zip(ids, keys)
            ],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
