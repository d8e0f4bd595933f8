"""Regenerate the pinned golden fixtures (tests/fixtures/golden_sf0.001.json).

Run ONLY after a deliberate extraction-semantics change, paired with an
EXTRACTOR_VERSION bump in ai_pdf_extraction_ray/__init__.py — the golden
gate (tests/test_golden.py) fails on version mismatch to force this pairing.

Usage: python tools/regen_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import pyarrow.parquet as pq

    from ai_pdf_extraction_ray import EXTRACTOR_VERSION
    from ai_pdf_extraction_ray.sources.corpus import is_pdf_row, synthesize_pages_table
    from ai_pdf_extraction_ray.stages.html_extract import extract_html
    from ai_pdf_extraction_ray.stages.pdf_extract import extract_pdf

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = synthesize_pages_table(docs)
    rows = []
    for i in range(pages.num_rows):
        d = pages.column("doc_id")[i].as_py()
        payload = pages.column("html")[i].as_py()
        rec = extract_pdf(payload) if is_pdf_row(d) else extract_html(payload)
        truth = pages.column("text")[i].as_py()
        assert rec["text"] == truth, f"doc {d}: extraction no longer matches ground truth"
        rows.append({
            "url": pages.column("url")[i].as_py(),
            "payload_sha256": hashlib.sha256(payload).hexdigest(),
            "expected_text_sha256": hashlib.sha256(rec["text"].encode()).hexdigest(),
            "expected_confidence": rec["confidence"],
            "expected_n_blocks": rec["n_blocks"],
            "expected_spans": rec["spans"],
        })
    out = REPO / "tests" / "fixtures" / "golden_sf0.001.json"
    with open(out, "w", encoding="utf-8") as f:
        json.dump({"extractor_version": EXTRACTOR_VERSION, "sf": "sf0.001",
                   "n": len(rows), "rows": rows}, f, sort_keys=True)
    print(f"regenerated {len(rows)} golden rows at extractor {EXTRACTOR_VERSION}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
