"""Export sinks: CSV and JSON envelope.

Byte-compatible reimplementation of the reference's frontend exports
(reference: app/frontend/src/components/EditableResultsTable.tsx:202-288;
format proven by the committed golden fixtures
app/test-pdfs/*/extraction_results.{csv,json}):

CSV (exportToCSV, tsx:230-265):
- header: ``source_file, confidence, warnings, is_reviewed, <fields...>,
  <field>_confidence...``
- every cell double-quoted, embedded quotes doubled
- array cells: items joined ``" | "``; object items JSON-encoded with every
  ``,`` replaced by ``"; "`` (the reference replaces commas globally,
  including inside strings — preserved verbatim, tsx:203-224)
- warnings joined ``"; "``
- field confidences as integer percent (round(conf*100)); missing -> ""

JSON (exportToJSON, tsx:267-288): envelope ``{schema, batch_id,
exported_at, total_documents, average_confidence, results}``.

Exports are report-scale sinks (one batch's reviewed results — human
sized); the 100 TB sink remains partitioned parquet. The formatter runs
distributed (map_batches -> csv line per row); the driver streams batches
to the file so nothing materializes.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

from ray.data import Dataset

from ..schema import SchemaDefinition


def format_cell_for_csv(value: Any) -> str:
    """tsx:202-224 formatCellForCSV."""
    if value is None:
        return ""
    if isinstance(value, list):
        parts = []
        for item in value:
            if isinstance(item, (dict, list)):
                parts.append(
                    json.dumps(item, separators=(",", ":"), ensure_ascii=False)
                    .replace(",", "; ")
                )
            else:
                parts.append(_js_str(item))
        return " | ".join(parts)
    if isinstance(value, dict):
        return json.dumps(value, separators=(",", ":"), ensure_ascii=False)
    return _js_str(value)


def _js_str(v: Any) -> str:
    """JS String(x) semantics for the scalar types we emit."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _quote(cell: str) -> str:
    return '"' + cell.replace('"', '""') + '"'


def csv_header(schema: SchemaDefinition) -> str:
    names = [f.name for f in schema.fields]
    return ",".join(
        ["source_file", "confidence", "warnings", "is_reviewed"]
        + names
        + [f"{n}_confidence" for n in names]
    )


def csv_row(
    source_file: str,
    confidence: float,
    warnings: list[str],
    extracted_data: dict[str, Any],
    field_confidences: dict[str, float],
    schema: SchemaDefinition,
    is_reviewed: bool = False,
) -> str:
    cells = [
        _js_str(source_file),
        _js_str(confidence),
        "; ".join(warnings or []),
        "true" if is_reviewed else "false",
    ]
    for f in schema.fields:
        cells.append(format_cell_for_csv(extracted_data.get(f.name)))
    import math

    for f in schema.fields:
        conf = (field_confidences or {}).get(f.name)
        # JS Math.round (half toward +inf), not python banker's rounding
        cells.append(str(math.floor(conf * 100 + 0.5)) if conf is not None else "")
    return ",".join(_quote(c) for c in cells)


def _rows_to_lines(batch: pa.Table, schema_dict: dict) -> pa.Table:
    schema = SchemaDefinition.from_dict(schema_dict)
    lines = []
    urls = batch.column("url").to_pylist()
    confs = batch.column("confidence").to_pylist()
    warns = batch.column("warnings").to_pylist()
    fields = [json.loads(x) for x in batch.column("fields_json").to_pylist()]
    fconfs = [json.loads(x) for x in batch.column("field_confidences_json").to_pylist()]
    reviewed = (
        batch.column("is_reviewed").to_pylist()
        if "is_reviewed" in batch.column_names
        else [False] * batch.num_rows
    )
    for u, c, w, fd, fc, rv in zip(urls, confs, warns, fields, fconfs, reviewed):
        lines.append(csv_row(u, c, list(w or []), fd, fc, schema, bool(rv)))
    return pa.table({"line": pa.array(lines, pa.string())})


def export_csv(extractions: Dataset, schema: SchemaDefinition, path: str) -> int:
    """Stream extraction rows into one reference-format CSV file."""
    lines = extractions.map_batches(
        _rows_to_lines,
        fn_kwargs={"schema_dict": schema.to_dict()},
        batch_format="pyarrow",
    )
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write(csv_header(schema) + "\n")
        for batch in lines.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for line in batch.column("line").to_pylist():
                f.write(line + "\n")
                n += 1
    return n


def export_json(
    extractions: Dataset,
    schema: SchemaDefinition,
    path: str,
    *,
    batch_id: str = "",
    exported_at: str = "1970-01-01T00:00:00Z",
) -> dict:
    """Reference JSON envelope (tsx:267-288). ``exported_at`` is a caller
    input — no wall clock in the engine (determinism)."""
    results = []
    total = 0
    conf_sum = 0.0
    for batch in extractions.iter_batches(batch_size=4096, batch_format="pyarrow"):
        urls = batch.column("url").to_pylist()
        confs = batch.column("confidence").to_pylist()
        warns = batch.column("warnings").to_pylist()
        fields = [json.loads(x) for x in batch.column("fields_json").to_pylist()]
        fconfs = [json.loads(x) for x in batch.column("field_confidences_json").to_pylist()]
        for u, c, w, fd, fc in zip(urls, confs, warns, fields, fconfs):
            results.append({
                "source_file": u,
                "detected_schema": schema.name,
                "extracted_data": fd,
                "confidence": c,
                "warnings": list(w or []),
                "field_confidences": fc,
            })
            total += 1
            conf_sum += c
    envelope = {
        "schema": schema.to_dict(),
        "batch_id": batch_id,
        "exported_at": exported_at,
        "total_documents": total,
        "average_confidence": (conf_sum / total) if total else 0.0,
        "results": results,
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(envelope, f, indent=2, ensure_ascii=False)
    return envelope
