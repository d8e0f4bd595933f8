"""Golden-fixture gate: byte-identical extracted text per url vs the PINNED
fixture file (north rule). Regenerate tests/fixtures/golden_sf0.001.json only
on a deliberate EXTRACTOR_VERSION bump — this test failing means extraction
semantics changed."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from ai_pdf_extraction_ray import EXTRACTOR_VERSION
from ai_pdf_extraction_ray.sources.corpus import is_pdf_row, synthesize_pages_table
from ai_pdf_extraction_ray.stages.html_extract import extract_html
from ai_pdf_extraction_ray.stages.pdf_extract import extract_pdf

GOLDEN = Path(__file__).parent / "fixtures" / "golden_sf0.001.json"


@pytest.fixture(scope="module")
def golden() -> dict:
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


def test_fixture_matches_extractor_version(golden):
    assert golden["extractor_version"] == EXTRACTOR_VERSION, (
        "EXTRACTOR_VERSION changed without regenerating the golden fixtures"
    )


def test_byte_identity_against_pinned_fixtures(golden):
    pages = synthesize_pages_table(
        pq.read_table("/root/testdata/sf0.001/documents.parquet")
    )
    expected = {r["url"]: r for r in golden["rows"]}
    assert len(expected) == pages.num_rows
    for i in range(pages.num_rows):
        url = pages.column("url")[i].as_py()
        payload = pages.column("html")[i].as_py()
        exp = expected[url]
        # the INPUT is also pinned: corpus generator drift is a failure too
        assert hashlib.sha256(payload).hexdigest() == exp["payload_sha256"], (
            f"corpus payload drifted for {url}"
        )
        d = pages.column("doc_id")[i].as_py()
        rec = extract_pdf(payload) if is_pdf_row(d) else extract_html(payload)
        assert rec["error"] is None, url
        got = hashlib.sha256(rec["text"].encode()).hexdigest()
        assert got == exp["expected_text_sha256"], f"extracted text drifted for {url}"
        assert rec["confidence"] == exp["expected_confidence"], url
        assert rec["n_blocks"] == exp["expected_n_blocks"], url
        assert rec["spans"] == exp["expected_spans"], url
