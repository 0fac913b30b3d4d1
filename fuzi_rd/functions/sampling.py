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

__all__ = ["stratified_sample_keep", "split_assign"]


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


def split_assign(
    ds,
    id_col: str = "doc_id",
    t_train: int = 230,
    t_val: int = 243,
    col: str = "split",
):
    """Deterministic train/val/test assignment: append a ``split`` column
    keyed on ``md5(id)``'s first byte — ``train`` when ``byte < t_train``,
    ``val`` when ``byte < t_val``, else ``test`` (defaults ≈ 90/5/5).

    The same no-RNG rule as ``doc_sample``: assignment is a pure function
    of the row id, so it is stable across runs, engines, batch sizes,
    cluster shapes and re-shards — a document can never migrate between
    train and test when the corpus is re-processed, which is the property
    that matters for contamination control.  Embarrassingly parallel: one
    ``map_batches``, no shuffle, no driver state."""
    if not 0 <= t_train <= t_val <= 256:
        raise ValueError("need 0 <= t_train <= t_val <= 256")

    def assign(batch: pa.Table) -> pa.Table:
        labels = []
        for i in batch.column(id_col).to_pylist():
            b = hashlib.md5(str(i).encode()).digest()[0]
            labels.append(
                "train" if b < t_train else ("val" if b < t_val else "test")
            )
        return batch.append_column(col, pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")
