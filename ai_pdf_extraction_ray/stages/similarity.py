"""Similarity search over embedding columns (list<float>).

Two paths over the ``embeddings`` table:

- brute-force cosine top-k (the exact baseline): numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once); per-batch local
  top-k partials are merged on the driver — the shuffle carries k rows per
  batch, never the matrix. Scales linearly in corpus size; the canonical
  flat-scan ANN baseline.

- IVF (inverted-file) approximate search: k-means coarse quantizer trained
  on a driver-side sample (small, seeded), centroids broadcast; each batch
  assigns rows to their nearest centroid (the "list"). Queries probe only
  ``nprobe`` nearest lists — at scale this is a partition-pruned read
  (each list is a parquet partition), so a query touches nprobe/nlist of
  the data. Recall is approximate by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from ..functions.rounding import np_round


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    return np.stack(batch.column("embedding").to_pylist()).astype(np.float64)


def knn_flat(
    sf_dir: str, query: np.ndarray, k: int = 10, *, exclude: set[int] | None = None
) -> pd.DataFrame:
    """Exact cosine top-k: per-batch partial top-k -> driver merge."""
    q = _normalize(np.asarray(query, dtype=np.float64))
    q_ref = ray.put(q)
    excl = exclude or set()

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        X = _normalize(_emb_matrix(batch))
        cos = X @ qv
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if excl:
            mask = ~np.isin(ids, list(excl))
            cos, ids = cos[mask], ids[mask]
        # round BEFORE selection with the shared half-away helper, and break
        # ties by vec_id — the local top-k must use exactly the oracle's
        # ORDER BY rounded-cos DESC, vec_id, or boundary ties can drop the
        # row DuckDB keeps (review finding)
        cos_r = np_round(cos, 6)
        order = np.lexsort((ids, -cos_r))[: min(k, len(ids))]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "cos": pa.array(cos_r[order], pa.float64()),
        })

    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        partials.sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def train_centroids(X: np.ndarray, nlist: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Plain seeded Lloyd k-means on normalized vectors (deterministic)."""
    rng = np.random.RandomState(seed)
    Xn = _normalize(X)
    cents = Xn[rng.choice(len(Xn), size=min(nlist, len(Xn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ cents.T, axis=1)
        for c in range(len(cents)):
            members = Xn[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


class IvfAssigner:
    """Actor-pool stage: embedding -> nearest-centroid list id."""

    def __init__(self, centroids_ref) -> None:  # noqa: ANN001 — ObjectRef
        self.centroids = ray.get(centroids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_emb_matrix(batch))
        assign = np.argmax(X @ self.centroids.T, axis=1)
        return batch.append_column("list_id", pa.array(assign.astype("int32")))


def build_ivf(
    sf_dir: str, *, nlist: int = 16, sample_n: int = 2048, concurrency: int = 2
) -> tuple[Dataset, np.ndarray]:
    """Assign every vector to an IVF list; returns (assigned ds, centroids).

    The quantizer trains on a seeded driver-side sample (at 100 TB: a
    ds.random_sample readout — training data stays tiny), then broadcasts.
    """
    import pyarrow.parquet as pq

    sample = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).slice(0, sample_n)
    X = np.stack(sample.column("embedding").to_pylist()).astype(np.float64)
    cents = train_centroids(X, nlist)
    cents_ref = ray.put(cents)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    assigned = ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids_ref": cents_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    return assigned, cents


def knn_ivf(
    sf_dir: str, query: np.ndarray, k: int = 10, *, nlist: int = 16,
    nprobe: int = 4, exclude: set[int] | None = None, concurrency: int = 2,
) -> pd.DataFrame:
    """Approximate top-k: scan only the nprobe lists nearest the query."""
    assigned, cents = build_ivf(sf_dir, nlist=nlist, concurrency=concurrency)
    q = _normalize(np.asarray(query, dtype=np.float64))
    probe = set(np.argsort(-(cents @ q))[:nprobe].tolist())
    excl = exclude or set()

    def scan(batch: pa.Table) -> pa.Table:
        lists = batch.column("list_id").to_numpy(zero_copy_only=False)
        mask = np.isin(lists, list(probe))
        sub = batch.filter(pa.array(mask))
        if sub.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        X = _normalize(_emb_matrix(sub))
        cos = X @ q
        ids = sub.column("vec_id").to_numpy(zero_copy_only=False)
        if excl:
            m2 = ~np.isin(ids, list(excl))
            cos, ids = cos[m2], ids[m2]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cos": pa.array(np_round(cos, 6), pa.float64()),
        })

    hits = assigned.map_batches(scan, batch_format="pyarrow").to_pandas()
    return (
        hits.sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
