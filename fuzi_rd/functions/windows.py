"""Windowed / stateful-stream analogs expressed as batch dataset ops.

  sessionize   gap-based session windows per key (the classic streaming
               session window, computed batch-style: one hash shuffle on
               the key, vectorized numpy session assignment per group)

Scale shape: the only exchange is the groupby on the (int64) key; each
group task holds ONE key's events (a user's stream — bounded), sorts it
once, and emits one row per session.  Hot keys (bots with millions of
events) are the skew risk; cap with an upstream per-key limit or split by
(key, day) when event streams are unbounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_US_30MIN = 30 * 60 * 1_000_000


def sessionize(ds, key: str = "user_id", ts: str = "ts", gap_us: int = _US_30MIN):
    """events -> one row per (key, session): (key, session_id, n_events,
    duration_us).  A session closes when the gap to the next event exceeds
    ``gap_us``; session_id is 0-based in time order; ties broken by
    event_id so the output is deterministic."""

    def _per_key(group: pa.Table) -> pa.Table:
        kv = group.column(key)[0].as_py()
        t = group.column(ts)
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        t = t.to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t))
        t = t[order]
        # new session where the gap from the previous event exceeds gap_us
        new = np.ones(len(t), dtype=np.int64)
        if len(t) > 1:
            new[1:] = (t[1:] - t[:-1] > gap_us).astype(np.int64)
        sess = np.cumsum(new) - 1
        n_sessions = int(sess[-1]) + 1 if len(sess) else 0
        counts = np.bincount(sess, minlength=n_sessions)
        # sessions are contiguous runs in time order: first/last index
        starts = np.zeros(n_sessions, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ends = starts + counts - 1
        return pa.table(
            {
                key: pa.array([kv] * n_sessions, group.schema.field(key).type),
                "session_id": pa.array(range(n_sessions), pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "duration_us": pa.array(t[ends] - t[starts], pa.int64()),
            }
        )

    return ds.groupby(key).map_groups(_per_key, batch_format="pyarrow")
