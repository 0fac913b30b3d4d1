"""Similarity search over an embedding column (list<float>).

  brute_force_topk   exact cosine top-k: numpy matmul per batch against a
                     broadcast query matrix, per-batch partial top-k, tiny
                     driver-side merge (never materializes the dataset)
  lsh_topk           random-hyperplane LSH bucketing: the scale path — only
                     buckets near the query's signature are scanned

Scale notes: the query matrix is put in the object store ONCE (``ray.put``)
and read zero-copy by every task — never re-shipped per batch.  Per-batch
top-k keeps the shuffle-free reduction at O(batches * k) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy-ish: flat values + fixed dim reshape
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _cosine_scores(mat: np.ndarray, query: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1) * np.linalg.norm(query)
    norms[norms == 0] = 1.0
    return (mat @ query) / norms


class PartialTopK:
    """map_batches class: emits each batch's local top-k (vec_id, sim)."""

    def __init__(self, query_ref, k: int):
        import ray

        # ray.put once in the driver; ray.get here is zero-copy shared memory
        self.query = np.asarray(
            ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref,
            dtype=np.float64,
        )
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch)
        sims = _cosine_scores(mat, self.query)
        k = min(self.k, len(sims))
        idx = np.argpartition(-sims, k - 1)[:k] if k else np.array([], dtype=int)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").take(pa.array(idx)),
                "sim": pa.array(sims[idx], pa.float64()),
            }
        )


def brute_force_topk(ds, query: np.ndarray, k: int = 10) -> list[dict]:
    """Exact cosine top-k.  Returns [{rank, vec_id, sim}] sorted by
    descending similarity (vec_id ascending tiebreak, deterministic)."""
    import ray

    query_ref = ray.put(np.asarray(query, dtype=np.float64))
    partial = ds.map_batches(
        PartialTopK,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    rows = partial.take_all()  # O(num_batches * k) rows only
    rows.sort(key=lambda r: (-r["sim"], r["vec_id"]))
    return [
        {"rank": i + 1, "vec_id": r["vec_id"], "sim": r["sim"]}
        for i, r in enumerate(rows[:k])
    ]


# -- LSH variant (scale path) ------------------------------------------------

_N_PLANES = 12


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(42)
    return rng.standard_normal((_N_PLANES, dim))


def _signature(planes: np.ndarray, v: np.ndarray) -> int:
    bits = (planes @ v) > 0
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


def lsh_topk(ds, query: np.ndarray, k: int = 10, max_hamming: int = 2) -> list[dict]:
    """Approximate top-k: scan only vectors whose hyperplane signature is
    within `max_hamming` bits of the query's.  Recall/latency tradeoff is
    controlled by (_N_PLANES, max_hamming)."""
    import ray

    query = np.asarray(query, dtype=np.float64)
    dim = len(query)
    planes = _planes(dim)
    qsig = _signature(planes, query)
    query_ref = ray.put(query)
    planes_ref = ray.put(planes)

    class BucketScan:
        def __init__(self):
            self.query = ray.get(query_ref)
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _batch_matrix(batch)
            bits = (mat @ self.planes.T) > 0
            sigs = (bits * (1 << np.arange(_N_PLANES))).sum(axis=1).astype(np.int64)
            ham = np.vectorize(lambda s: bin(int(s) ^ qsig).count("1"))(sigs)
            mask = ham <= max_hamming
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
                )
            sims = _cosine_scores(mat[idx], self.query)
            return pa.table(
                {
                    "vec_id": batch.column("vec_id").take(pa.array(idx)),
                    "sim": pa.array(sims, pa.float64()),
                }
            )

    rows = ds.map_batches(
        BucketScan, batch_format="pyarrow", concurrency=(1, 8)
    ).take_all()
    rows.sort(key=lambda r: (-r["sim"], r["vec_id"]))
    return [
        {"rank": i + 1, "vec_id": r["vec_id"], "sim": r["sim"]}
        for i, r in enumerate(rows[:k])
    ]
