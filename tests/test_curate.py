"""curate_job: the end-to-end corpus curation pipeline (filters -> dedup ->
split assignment -> partitioned sink + report)."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.usefixtures("ray_session")
class TestCurateJob:
    def test_end_to_end(self, tmp_path):
        from ai_pdf_extraction_ray.pipelines.curate import (
            KEEP_LANG,
            MIN_TTR,
            MIN_WORDS,
            curate_job,
        )

        out = tmp_path / "curated"
        report = curate_job(SF_SMOKE, str(out))
        assert report["n_input"] == 500
        assert 0 < report["n_kept"] < 500
        assert sum(report["per_split"].values()) == report["n_kept"]
        assert set(report["per_split"]) <= {"train", "val", "test"}
        # the report on disk matches the returned one
        assert json.loads((out / "_REPORT.json").read_text()) == report

        import pyarrow.dataset as pads

        written = pads.dataset(str(out), format="parquet",
                               partitioning="hive").to_table().to_pandas()
        assert len(written) == report["n_kept"]
        assert (written["lang"] == KEEP_LANG).all()
        # dedup: kept texts are unique
        assert written["text"].nunique() == len(written)
        # every kept doc passes the quality gate
        import re

        for t in written["text"].head(50):
            toks = re.findall(r"\S+", t.lower())
            assert len(toks) >= MIN_WORDS
            assert len(set(toks)) / len(toks) >= MIN_TTR

    def test_rerun_is_deterministic(self, tmp_path):
        from ai_pdf_extraction_ray.pipelines.curate import curate_job

        r1 = curate_job(SF_SMOKE, str(tmp_path / "a"))
        r2 = curate_job(SF_SMOKE, str(tmp_path / "b"))
        assert r1 == r2


@pytest.mark.usefixtures("ray_session")
class TestReportMatchesCatalog:
    def test_job_report_equals_curation_splits_query(self, tmp_path):
        """curate_job's per-split counts must equal the oracle-verified
        curation_splits catalog query — the sink job is tied to the
        correctness gate through this equivalence."""
        from ai_pdf_extraction_ray.pipelines.curate import curate_job
        from ai_pdf_extraction_ray.pipelines.queries import q_curation_splits

        report = curate_job(SF_SMOKE, str(tmp_path / "out"))
        q = q_curation_splits(SF_SMOKE).to_pandas()
        assert dict(zip(q["split"], q["n_docs"])) == report["per_split"]
