"""JSONL source lane: newline-delimited JSON -> canonical documents table.

Web-text corpora commonly ship as JSONL (one record per line with text +
metadata, e.g. Common-Crawl derivative dumps). This source reads whole
files with ``ray.data.read_binary_files`` (one task per file — the same
per-file parallelism Arrow's JSON reader gives, since JSONL files are not
split mid-file anyway) and parses each with ``pyarrow.json`` (C-speed
columnar parse), so every record knows its TRUE (file path, row offset).
Records normalize to the ``documents`` schema
``(doc_id, text, lang, source, n_chars)``:

- missing ``lang`` defaults to ``'und'``, missing ``source`` to the
  caller-supplied label, ``n_chars`` is recomputed from the text (never
  trusted from the record);
- records with no usable ``text`` (absent / null / empty) become failure
  ROWS with ``ingest_error`` set, mirroring the raw-file lane's
  failure-is-data contract (sources/files.py) — at 100 TB a dropped row
  is an invisible data loss, an error row is auditable;
- ``doc_id`` is taken from the record when present, else derived from
  md5(file path, row offset) — stable across reruns and partitionings
  (the offset is a property of the file, not of block order) and UNIQUE
  per record, so error rows and repeated-text records keep distinct,
  joinable ids (advisor round-2 finding: a content-only digest collapsed
  every empty-text error row onto md5("")).

Memory note: one file's bytes land in one block; shard JSONL corpora into
the usual few-hundred-MB files and blocks stay object-store friendly.
"""

from __future__ import annotations

import hashlib
import io

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
    ("ingest_error", pa.string()),
])


def _normalize_file(t: pa.Table, path: str, default_source: str) -> pa.Table:
    names = set(t.column_names)

    def col(name: str) -> list:
        if name in names:
            return t.column(name).to_pylist()
        return [None] * len(t)

    texts = col("text")
    ids = col("doc_id")
    langs = col("lang")
    sources = col("source")
    out_id, out_text, out_lang, out_src, out_n, out_err = [], [], [], [], [], []
    for row, (i, txt, lg, src) in enumerate(zip(ids, texts, langs, sources)):
        err = None
        if not isinstance(txt, str) or not txt:
            err, txt = "empty_or_missing_text", ""
        if not (isinstance(i, int) and not isinstance(i, bool)):
            if i is not None:
                # a string/object doc_id crashed the whole task via int()
                # before (review finding) — keep the record, derive a
                # stable id, and make the bad id auditable
                err = err or f"invalid_doc_id: {str(i)[:60]}"
            digest = hashlib.md5(f"{path}\x00{row}".encode()).digest()
            i = int.from_bytes(digest[:8], "little") >> 1  # stable, >= 0
        out_id.append(int(i))
        out_text.append(txt)
        out_lang.append(lg if isinstance(lg, str) and lg else "und")
        out_src.append(src if isinstance(src, str) and src else default_source)
        out_n.append(len(txt))
        out_err.append(err)
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array(out_n, pa.int64()),
        "ingest_error": pa.array(out_err, pa.string()),
    })


def read_jsonl_corpus(path: str, *, default_source: str = "jsonl") -> Dataset:
    """JSONL file(s)/directory -> canonical documents table (+ ingest_error)."""
    import pyarrow.json as pj

    files = rd.read_binary_files(path, include_paths=True)

    def parse(b: pa.Table) -> pa.Table:
        out = []
        for pth, data in zip(b.column("path").to_pylist(),
                             b.column("bytes").to_pylist()):
            if not data or not data.strip():
                continue  # empty file: zero records, nothing to audit
            try:
                t = pj.read_json(io.BytesIO(data))
            except pa.ArrowInvalid as exc:
                # malformed JSON aborts Arrow's whole-file parse; the
                # failure-is-data contract still applies — emit ONE
                # auditable error row for the file (doc_id from
                # md5(path, 0), like any id-less record) instead of
                # crashing the ingest task (advisor round-3 finding)
                bad = pa.table({"doc_id": pa.array([None], pa.int64()),
                                "text": pa.array([None], pa.string())})
                row = _normalize_file(bad, pth, default_source)
                err = f"malformed_json: {str(exc)[:120]}"
                row = row.set_column(
                    row.schema.get_field_index("ingest_error"),
                    "ingest_error", pa.array([err], pa.string()))
                out.append(row)
                continue
            out.append(_normalize_file(t, pth, default_source))
        if not out:
            return _OUT_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return files.map_batches(parse, batch_format="pyarrow")
