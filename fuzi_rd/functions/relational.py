"""Relational helpers the reference lacks entirely (SURVEY.md §2.7) —
engine-level operators expressed Ray-Data-first.

  broadcast_join   small-side lookup join: the small table is ray.put into
                   the object store ONCE and read zero-copy by every task
                   (never re-shipped per batch); avoids an all-to-all
                   shuffle when one side fits in memory.  Lookup is fully
                   vectorized (pc.index_in + take), no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class _BroadcastJoiner:
    def __init__(self, lookup_ref, key: str, value_cols: list[str]):
        import ray

        small: pa.Table = ray.get(lookup_ref).combine_chunks()
        self.small_keys = small.column(key)
        self.values = {c: small.column(c) for c in value_cols}
        self.value_cols = value_cols
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column(self.key), value_set=self.small_keys)
        for c in self.value_cols:
            batch = batch.append_column(c, pc.take(self.values[c], idx))
        return batch


def broadcast_join(ds, small: pa.Table, key: str, value_cols: list[str],
                   concurrency=(1, 8)):
    """Join `value_cols` from `small` onto `ds` by `key` without a shuffle.

    Left join semantics: unmatched keys get null values (callers filter if
    they need inner-join behavior)."""
    import ray

    lookup_ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={
            "lookup_ref": lookup_ref,
            "key": key,
            "value_cols": value_cols,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
