"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference only ever *computes* a content hash "for deduplication"
without filtering (reference routers/batches.py:381, models_db.py:191-195);
this module supplies the real thing plus the near-dup family a
training-data pipeline needs at 100 TB.

Shuffle discipline:
- exact dedup: one hash-keyed groupby (the digest, 16 bytes, is the
  shuffle payload — never the document);
- MinHash LSH: signatures computed vectorized per batch (one pass over
  text), then EXPLODED to (band_id, band_hash, doc_id) rows; the groupby
  on (band_id, band_hash) moves only those triples. Candidate pairs are
  verified with exact n-gram Jaccard inside the group;
- SimHash: per-batch vectorized 64-bit signatures; near-dup = identical
  value on any of 4 16-bit sub-bands (Hamming<=3-ish blocking), same
  explode->groupby shape.

All hashing is seeded/deterministic (fixed linear-congruential parameter
tables — no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min

_TOKEN = re.compile(r"\S+")

# deterministic 64-bit universal-hash parameters for MinHash permutations
_MERSENNE = (1 << 61) - 1


def _hash_params(n: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    return a, b


def shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingles as stable 64-bit hashes (md5-derived, not
    PYTHONHASHSEED-dependent)."""
    toks = _TOKEN.findall(text.lower())
    out: set[int] = set()
    for i in range(max(0, len(toks) - k + 1)):
        g = " ".join(toks[i:i + k])
        out.add(int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little"))
    return out


def minhash_signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of universal hashes over the shingle set."""
    if not sh:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (n_perm, n_shingles) via broadcasting; modulo a Mersenne prime
    vals = (np.multiply.outer(a, x) + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class MinHasher:
    """Actor-pool stage: text -> minhash signature + band hashes.

    State (permutation tables) built once per actor (__init__), mirroring
    the reference's load-once client singleton pattern
    (services/ai/__init__.py:117-133).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3) -> None:
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _hash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_bhash = [], [], []
        for d, t in zip(ids, texts):
            sig = minhash_signature(shingles(t or "", self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_doc.append(d)
                out_band.append(band)
                out_bhash.append(h)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_bhash, pa.string()),
        })


def minhash_candidate_pairs(
    docs: Dataset, *, num_perm: int = 64, bands: int = 16, k: int = 3,
    concurrency: int = 2,
) -> Dataset:
    """documents(doc_id, text) -> candidate near-dup pairs (doc_a < doc_b).

    shingle -> minhash -> band explode -> groupby(band) -> pairs. The pair
    set is deduplicated by a second groupby on (doc_a, doc_b).
    """
    banded = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        ia, ib = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # dedupe pairs found in multiple bands
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def minhash_near_dups(
    sf_dir: str, *, threshold: float = 0.8, num_perm: int = 64, bands: int = 16,
    k: int = 3, concurrency: int = 2,
) -> pd.DataFrame:
    """Candidates + exact n-gram Jaccard verification (broadcast texts of
    candidate docs only — the candidate set is tiny relative to the corpus).
    Returns (doc_a, doc_b, jaccard) pairs above threshold."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cand = minhash_candidate_pairs(
        docs, num_perm=num_perm, bands=bands, k=k, concurrency=concurrency
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    needed = set(cand.doc_a) | set(cand.doc_b)

    def keep(b: pa.Table) -> pa.Table:
        mask = np.isin(b.column("doc_id").to_numpy(zero_copy_only=False), list(needed))
        return b.filter(pa.array(mask))

    texts = docs.map_batches(keep, batch_format="pyarrow").to_pandas()
    tmap = dict(zip(texts.doc_id, texts.text))
    sh = {d: shingles(tmap[d], k) for d in needed if d in tmap}
    jac = [
        jaccard(sh.get(a, set()), sh.get(b, set()))
        for a, b in zip(cand.doc_a, cand.doc_b)
    ]
    cand = cand.assign(jaccard=np.round(jac, 6))
    out = cand[cand.jaccard >= threshold].reset_index(drop=True)
    return out.astype({"doc_a": "int64", "doc_b": "int64"})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (md5 token hashes, +-1 bit votes)."""
    toks = _TOKEN.findall((text or "").lower())
    if not toks:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), 1, -1)
    sig = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


class SimHasher:
    """Actor-pool stage: text -> (doc_id, simhash, 4x16-bit sub-bands)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = [simhash64(t) for t in batch.column("text").to_pylist()]
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            # store as int64 via two's complement for parquet friendliness
            "simhash": pa.array([s - (1 << 64) if s >= (1 << 63) else s for s in sigs],
                                pa.int64()),
        }
        for band in range(4):
            cols[f"band_{band}"] = pa.array(
                [(s >> (16 * band)) & 0xFFFF for s in sigs], pa.int32()
            )
        return pa.table(cols)


def simhash_signatures(sf_dir: str, *, concurrency: int = 2) -> Dataset:
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_near_dups(sf_dir: str, *, max_hamming: int = 3,
                      concurrency: int = 2) -> pd.DataFrame:
    """Banded SimHash near-dup: docs sharing any 16-bit sub-band are
    candidates (guarantees recall for Hamming distance <= 3 over 4 bands);
    verified by full Hamming distance."""
    # materialize: the signature table is tiny (5 ints per doc) and is
    # consumed once per band — without this the whole read+SimHasher
    # pipeline re-executes 4x (lazy Dataset)
    sigs = simhash_signatures(sf_dir, concurrency=concurrency).materialize()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        sh = g["simhash"].to_numpy()[order]
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype("int64")
        ia, ib = np.triu_indices(len(ids), 1)
        ham = [hamming64(int(sh[x]), int(sh[y])) for x, y in zip(ia, ib)]
        df = pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib], "hamming": ham})
        return df[df.hamming <= max_hamming]

    out = []
    for band in range(4):
        cand = sigs.groupby(f"band_{band}").map_groups(pairs, batch_format="pandas")
        out.append(cand.to_pandas())
    allp = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
    if allp.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    return (
        allp.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    )


# ---------------------------------------------------------------------------
# exact dedup over extraction output (payload_sha256 path)
# ---------------------------------------------------------------------------

def dedup_extractions_by_payload(extractions: Dataset) -> Dataset:
    """Keep one row per payload_sha256 (min url as the canonical survivor)
    — the corrected version of reference D1 (hash stored, never used)."""
    return extractions.groupby("payload_sha256").aggregate(
        Min("url", alias_name="url")
    )
