"""Raw-file ingestion lane: a directory of .html/.pdf files -> pages table.

The reference ingests uploaded FILES (multipart bytes + filename,
reference routers/batches.py:262-427 — validation at :354-383: reject
empty payloads and wrong extensions, sha256 at :381). This source is the
Ray-native equivalent: ``ray.data.read_binary_files(include_paths=True)``
streams (path, bytes) pairs; a vectorized validation stage applies the
same reject rules as failure ROWS; the result binds to the canonical
pages schema (``url`` = ``file://`` path, ``warc_ts`` = caller-supplied
fixed timestamp — no wall clock).

IMPORTANT: ``run_extraction`` neither reads nor propagates
``ingest_error`` (its output schema has its own ``error`` column) —
feeding the RAW ingest result into extraction would extract rejected
payloads as if valid and drop the audit trail (review finding). Split
first with ``partition_ingest``: extract the clean side, sink the error
side.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

_DEFAULT_TS = datetime(2024, 1, 1)
ALLOWED_EXTENSIONS = (".html", ".htm", ".pdf", ".txt")


def ingest_files(
    path: str,
    *,
    warc_ts: datetime = _DEFAULT_TS,
    allowed_extensions: tuple[str, ...] = ALLOWED_EXTENSIONS,
) -> Dataset:
    """Directory (or file list) of raw documents -> canonical pages table.

    Rows for rejected files (wrong extension, empty payload) carry an
    ``ingest_error`` column instead of being dropped — the audit trail the
    reference returns as HTTP 400s becomes data here. Route through
    ``partition_ingest`` before extraction (see module docstring).
    """
    ds = rd.read_binary_files(path, include_paths=True)

    def bind(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        errors: list[str | None] = []
        for p, b in zip(paths, payloads):
            low = p.lower()
            if not low.endswith(allowed_extensions):
                ext = (p.rsplit(".", 1)[-1] if "." in p.rsplit("/", 1)[-1]
                       else "(none)")
                errors.append(f"unsupported extension: {ext}")
            elif not b:
                errors.append("empty file")
            else:
                errors.append(None)
        return pa.table({
            "url": pa.array([f"file://{p}" for p in paths], pa.string()),
            "warc_ts": pa.array([warc_ts] * len(paths), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([None] * len(paths), pa.string()),
            "lang": pa.array([None] * len(paths), pa.string()),
            "ingest_error": pa.array(errors, pa.string()),
        })

    return ds.map_batches(bind, batch_format="pyarrow")


def partition_ingest(ds: Dataset) -> tuple[Dataset, Dataset]:
    """Split an ingest result into (extractable, rejected).

    The extractable side drops ``ingest_error`` (clean pages schema for
    ``run_extraction``); the rejected side keeps url + ingest_error and
    drops the payload (an audit sink needs the reason, not the bytes).
    """
    ok = ds.map_batches(
        lambda b: b.filter(pc.is_null(b.column("ingest_error")))
        .drop_columns(["ingest_error"]),
        batch_format="pyarrow")
    bad = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("ingest_error")))
        .select(["url", "ingest_error"]),
        batch_format="pyarrow")
    return ok, bad
