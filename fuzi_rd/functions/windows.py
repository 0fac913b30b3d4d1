"""Windowed / stateful-stream analogs expressed as batch dataset ops.

  sessionize   gap-based session windows per key (the classic streaming
               session window, computed batch-style: one hash shuffle on
               the key, vectorized numpy session assignment per group)

Scale shape: the only exchange is the groupby on the (int64) key; each
group task holds ONE key's events (a user's stream — bounded), sorts it
once, and emits one row per session.  Hot keys (bots with millions of
events) are the skew risk; ``sessionize(max_events_per_key=...)`` is the
built-in guard (loud error or deterministic truncation per key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_US_30MIN = 30 * 60 * 1_000_000


def sessionize(
    ds,
    key: str = "user_id",
    ts: str = "ts",
    gap_us: int = _US_30MIN,
    max_events_per_key: int | None = None,
    on_hot_key: str = "error",
):
    """events -> one row per (key, session): (key, session_id, n_events,
    duration_us).  A session closes when the gap to the next event exceeds
    ``gap_us``; session_id is 0-based in time order; ties broken by
    event_id so the output is deterministic.

    ``max_events_per_key`` is the hot-key guard: a key whose event stream
    exceeds it (a bot with millions of events — the skew hazard of any
    per-key group task) either raises a ValueError naming the key
    (``on_hot_key='error'``, the default: an actionable failure instead of
    a silent group-task OOM) or keeps only the key's earliest
    ``max_events_per_key`` events in (ts, event_id) order
    (``on_hot_key='truncate'``, deterministic, for pipelines that prefer
    to degrade bots rather than stop)."""
    if on_hot_key not in ("error", "truncate"):
        raise ValueError(f"on_hot_key must be 'error' or 'truncate', got {on_hot_key!r}")

    def _per_key(group: pa.Table) -> pa.Table:
        kv = group.column(key)[0].as_py()
        t = group.column(ts)
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        t = t.to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t))
        t = t[order]
        if max_events_per_key is not None and len(t) > max_events_per_key:
            if on_hot_key == "error":
                raise ValueError(
                    f"hot key {kv!r}: {len(t)} events > max_events_per_key="
                    f"{max_events_per_key}; exclude the key upstream or use "
                    "on_hot_key='truncate'"
                )
            t = t[:max_events_per_key]
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


def hopping_counts(
    ds,
    ts: str = "ts",
    size_us: int = 3600 * 1_000_000,
    step_us: int = 900 * 1_000_000,
    value_col: str | None = None,
):
    """Hopping (sliding) window aggregate: (window_start_us, n_events[,
    total_value_milli]) for every ``size_us`` window advancing by
    ``step_us`` (epoch-aligned).  Completes the window family next to the
    tumbling ``events_hourly`` bucket and the gap-based ``sessionize``.

    Scale shape: each event row-expands to its ``size/step`` covering
    windows inside ``map_batches`` (vectorized: one repeat + one tiled
    arange, no Python loop), then ONE groupby on the int64 window start —
    the same combiner-friendly exchange as a tumbling bucket, amplified by
    the fixed size/step ratio (keep it small; 4 here by default).  Values
    aggregate as integer millis so results are exactly reproducible (and
    SQL-oracle-checkable) regardless of summation order."""
    if size_us % step_us != 0:
        raise ValueError("size_us must be a multiple of step_us")
    k = size_us // step_us

    def _expand(batch: pa.Table) -> pa.Table:
        t = batch.column(ts)
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        t = t.to_numpy(zero_copy_only=False)
        # last window start covering t: floor(t/step)*step; the k covering
        # starts count down from it (clipped below zero lexically by the
        # window's own [start, start+size) check — epoch 0 is far away)
        last = (t // step_us) * step_us
        starts = np.repeat(last, k) - np.tile(
            np.arange(k, dtype=np.int64) * step_us, len(t)
        )
        cols = {"window_start_us": pa.array(starts, pa.int64())}
        if value_col is not None:
            import pyarrow.compute as pc

            # half_towards_infinity matches SQL round() tie behavior
            milli = pc.cast(
                pc.round(
                    pc.multiply(batch.column(value_col), 1000),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            cols["value_milli"] = pa.array(np.repeat(milli, k), pa.int64())
        return pa.table(cols)

    expanded = ds.map_batches(_expand, batch_format="pyarrow")
    if value_col is None:
        agg = expanded.groupby("window_start_us").count()
        names = ["window_start_us", "n_events"]
        types = [pa.int64(), pa.int64()]
    else:
        agg = expanded.groupby("window_start_us").aggregate(
            *_count_and_sum("value_milli")
        )
        names = ["window_start_us", "n_events", "total_value_milli"]
        types = [pa.int64(), pa.int64(), pa.int64()]

    schema = pa.schema(list(zip(names, types)))

    def _rename(b: pa.Table) -> pa.Table:
        if b.num_columns != len(names):
            return schema.empty_table()
        b = b.rename_columns(names)
        return pa.table(
            {n: b.column(n).cast(t) for n, t in zip(names, types)}
        )

    return agg.map_batches(_rename, batch_format="pyarrow")


def _count_and_sum(col: str):
    from ray.data.aggregate import Count, Sum

    return Count(), Sum(col)


def rolling_per_key(
    ds,
    key: str = "user_id",
    ts: str = "ts",
    window_us: int = 3600 * 1_000_000,
    value_col: str | None = "value",
    max_events_per_key: int | None = None,
):
    """Per-EVENT rolling stats over a trailing time window, plus the
    inter-event gap — the SQL window-frame family (``RANGE BETWEEN w
    PRECEDING AND CURRENT ROW`` and ``LAG``) the tumbling/hopping/session
    windows don't cover.  One output row per event:

      (event_id, key, n_window, win_value_milli?, gap_us)

    ``n_window`` counts the key's events with ``ts`` in ``[ts_i -
    window_us, ts_i]`` — including same-timestamp peers AFTER the current
    row, exactly the SQL RANGE-frame peer rule.  ``gap_us`` is the
    microseconds since the key's previous event in (ts, event_id) order
    (null for the key's first event) — SQL ``LAG``.  ``win_value_milli``
    is the frame's value sum in exact integer millis.

    Scale shape: ONE hash exchange (the groupby on the key); each group
    task sorts its key's stream once and computes every column
    vectorized — two ``np.searchsorted`` calls give the frame bounds, an
    int64 cumsum gives frame sums (exact, order-independent), ``np.diff``
    gives gaps.  No per-row Python, no window row-expansion (unlike the
    hopping window there is no size/step amplification).  Hot keys are
    the same skew hazard as ``sessionize``; ``max_events_per_key`` raises
    a loud ValueError naming the key rather than letting a bot's stream
    OOM a group task."""

    def _per_key(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kv = group.column(key)[0].as_py()
        t = group.column(ts)
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        t = t.to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        if max_events_per_key is not None and len(t) > max_events_per_key:
            raise ValueError(
                f"hot key {kv!r}: {len(t)} events > max_events_per_key="
                f"{max_events_per_key}; exclude the key upstream"
            )
        order = np.lexsort((eid, t))
        t, eid = t[order], eid[order]
        # frame bounds: [ts - window, ts] with same-ts peers included
        hi = np.searchsorted(t, t, side="right")
        lo = np.searchsorted(t, t - window_us, side="left")
        gaps = np.zeros(len(t), dtype=np.int64)
        if len(t) > 1:
            gaps[1:] = t[1:] - t[:-1]
        first = np.zeros(len(t), dtype=bool)
        if len(t):
            first[0] = True  # the key's first event has no LAG
        cols = {
            "event_id": pa.array(eid, pa.int64()),
            key: pa.array([kv] * len(t), group.schema.field(key).type),
            "n_window": pa.array(hi - lo, pa.int64()),
        }
        if value_col is not None:
            milli = (
                pc.cast(
                    pc.round(
                        pc.multiply(group.column(value_col), 1000),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                )
                .to_numpy(zero_copy_only=False)[order]
            )
            csum = np.zeros(len(t) + 1, dtype=np.int64)
            np.cumsum(milli, out=csum[1:])
            cols["win_value_milli"] = pa.array(csum[hi] - csum[lo], pa.int64())
        cols["gap_us"] = pa.array(gaps, pa.int64(), mask=first)
        return pa.table(cols)

    return ds.groupby(key).map_groups(_per_key, batch_format="pyarrow")
