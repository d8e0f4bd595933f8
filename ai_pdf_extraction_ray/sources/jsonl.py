"""JSONL source lane: newline-delimited JSON -> canonical documents table.

Web-text corpora commonly ship as JSONL (one record per line with text +
metadata, e.g. Common-Crawl derivative dumps). This source streams JSONL
through ``ray.data.read_json`` (arrow JSON reader — one task per file,
columnar batches) and normalizes records to the ``documents`` schema
``(doc_id, text, lang, source, n_chars)``:

- missing ``lang`` defaults to ``'und'``, missing ``source`` to the
  caller-supplied label, ``n_chars`` is recomputed from the text (never
  trusted from the record);
- records with no usable ``text`` (absent / null / empty) become failure
  ROWS with ``ingest_error`` set, mirroring the raw-file lane's
  failure-is-data contract (sources/files.py) — at 100 TB a dropped row
  is an invisible data loss, an error row is auditable;
- ``doc_id`` is taken from the record when present, else derived
  deterministically from the row's content digest (stable across reruns
  and partitionings — no monotonic counter, which would depend on block
  order).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def read_jsonl_corpus(path: str, *, default_source: str = "jsonl") -> Dataset:
    """JSONL file(s)/directory -> canonical documents table (+ ingest_error)."""
    ds = rd.read_json(path)

    def normalize(b: pa.Table) -> pa.Table:
        names = set(b.column_names)

        def col(name: str) -> list:
            if name in names:
                return b.column(name).to_pylist()
            return [None] * len(b)

        texts = col("text")
        ids = col("doc_id")
        langs = col("lang")
        sources = col("source")
        out_id, out_text, out_lang, out_src, out_n, out_err = [], [], [], [], [], []
        for i, t, lg, src in zip(ids, texts, langs, sources):
            err = None
            if not isinstance(t, str) or not t:
                err, t = "empty_or_missing_text", ""
            if i is None:
                digest = hashlib.md5(t.encode()).digest()
                i = int.from_bytes(digest[:8], "little") >> 1  # stable, >= 0
            out_id.append(int(i))
            out_text.append(t)
            out_lang.append(lg if isinstance(lg, str) and lg else "und")
            out_src.append(src if isinstance(src, str) and src else default_source)
            out_n.append(len(t))
            out_err.append(err)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array(out_n, pa.int64()),
            "ingest_error": pa.array(out_err, pa.string()),
        })

    return ds.map_batches(normalize, batch_format="pyarrow")
