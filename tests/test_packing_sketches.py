"""Round-2: sequence packing (distributed ordered prefix sum), per-user
event gaps, histogram-quantile sketch."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.usefixtures("ray_session")
class TestSequencePacking:
    def test_matches_single_process_prefix_sum(self):
        """The distributed range-offset cumsum must equal the naive ordered
        scan exactly — the whole point of the two-pass prefix-sum shape."""
        import re

        import pyarrow.parquet as pq

        from ai_pdf_extraction_ray.pipelines.queries import (
            PACK_CAPACITY,
            q_sequence_packing,
        )

        got = q_sequence_packing(SF_SMOKE).to_pandas().sort_values("doc_id")
        t = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
        t = t.sort_values("doc_id")
        n = t["text"].map(lambda s: len(re.findall(r"\S+", s or ""))).to_numpy()
        start = np.concatenate([[0], np.cumsum(n)[:-1]])
        assert got["n_tokens"].to_numpy().tolist() == n.tolist()
        assert got["tok_start"].to_numpy().tolist() == start.tolist()
        span = np.maximum(n, 1)
        assert (got["first_bin"].to_numpy() == start // PACK_CAPACITY).all()
        assert (got["last_bin"].to_numpy() == (start + span - 1) // PACK_CAPACITY).all()

    def test_bins_are_contiguous(self):
        """Consecutive docs tile the token stream: next.tok_start ==
        prev.tok_start + prev.n_tokens, and first_bin never decreases."""
        from ai_pdf_extraction_ray.pipelines.queries import q_sequence_packing

        df = q_sequence_packing(SF_SMOKE).to_pandas().sort_values("doc_id")
        ends = (df["tok_start"] + df["n_tokens"]).to_numpy()[:-1]
        assert (df["tok_start"].to_numpy()[1:] == ends).all()
        assert (np.diff(df["first_bin"].to_numpy()) >= 0).all()


@pytest.mark.usefixtures("ray_session")
class TestUserEventGaps:
    def test_one_user_against_pandas(self):
        import pyarrow.parquet as pq

        from ai_pdf_extraction_ray.pipelines.queries import q_user_event_gaps

        got = q_user_event_gaps(SF_SMOKE).to_pandas().set_index("user_id")
        ev = pq.read_table(f"{SF_SMOKE}/events.parquet",
                           columns=["user_id", "event_id", "ts"]).to_pandas()
        uid = int(ev["user_id"].iloc[0])
        g = ev[ev.user_id == uid].sort_values(["ts", "event_id"])
        secs = g["ts"].diff().dropna().dt.total_seconds()
        assert got.loc[uid, "n_gaps"] == len(secs)
        assert got.loc[uid, "max_gap_s"] == pytest.approx(secs.max(), abs=1e-3)
        assert got.loc[uid, "mean_gap_s"] == pytest.approx(secs.mean(), abs=1e-3)


@pytest.mark.usefixtures("ray_session")
class TestApproxQuantiles:
    def test_within_one_bin_of_exact(self):
        """Sketch quantiles must sit within one bin width of the exact
        per-key quantile — the sketch's accuracy contract."""
        import duckdb

        from ai_pdf_extraction_ray.stages.sketches import approx_quantiles_hist

        got = approx_quantiles_hist(SF_SMOKE).to_pandas().set_index("event_type")
        exact = duckdb.sql(
            f"""SELECT event_type, quantile_disc(value, 0.50) p50,
                       quantile_disc(value, 0.90) p90,
                       quantile_disc(value, 0.99) p99,
                       count(*) n
                FROM read_parquet('{SF_SMOKE}/events.parquet')
                GROUP BY event_type"""
        ).df().set_index("event_type")
        mm = duckdb.sql(
            f"SELECT max(value) - min(value) AS r FROM read_parquet('{SF_SMOKE}/events.parquet')"
        ).fetchone()[0]
        bin_w = mm / 2048.0
        for et in exact.index:
            assert got.loc[et, "n"] == exact.loc[et, "n"]
            for p in ("p50", "p90", "p99"):
                assert abs(got.loc[et, f"{p}_approx"] - exact.loc[et, p]) <= bin_w + 1e-4, (et, p)


@pytest.mark.usefixtures("ray_session")
class TestLabelCentroids:
    def test_matches_numpy_groupby(self):
        import pyarrow.parquet as pq

        from ai_pdf_extraction_ray.pipelines.queries import q_label_centroids

        got = q_label_centroids(SF_SMOKE).to_pandas()
        t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
        for lab, g in t.groupby("label"):
            X = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            want = X.mean(axis=0)
            sub = got[got.label == lab].sort_values("dim")["centroid"].to_numpy()
            assert len(sub) == X.shape[1]
            assert np.abs(sub - want).max() < 1e-5


class TestHash64ValueDeterminism:
    """_hash64 must hash a VALUE identically whatever its batch's
    null/dtype composition (nullable int columns surface as float/object
    batch-by-batch; review finding)."""

    def test_float_and_object_batches_match_int_batches(self):
        import numpy as np

        from ai_pdf_extraction_ray.stages.sketches import _hash64

        base = _hash64(np.array([42, 7, 9], dtype=np.int64))
        as_float = _hash64(np.array([42.0, np.nan, 7.0, 9.0]))
        as_object = _hash64([42, None, 7, 9])
        assert sorted(base) == sorted(as_float) == sorted(as_object)

    def test_true_floats_hash_consistently(self):
        import numpy as np

        from ai_pdf_extraction_ray.stages.sketches import _hash64

        a = _hash64(np.array([1.5, 2.5]))
        b = _hash64(np.array([1.5, np.nan, 2.5]))
        assert sorted(a) == sorted(b)

    def test_above_int64_boundary_types_agree(self):
        """+2^63 as Python bigint vs equal float must hash identically
        (uint64-sourced columns surface either way batch-by-batch;
        advisor round-4). -2^63 symmetric case already pinned above; also
        pin that the huge-float path stays injective where floats can
        distinguish values, and infs/non-integrals stay on the repr path."""
        import numpy as np

        from ai_pdf_extraction_ray.stages.sketches import _hash64

        as_int = _hash64([2 ** 63, 2 ** 64])
        as_float = _hash64(np.array([2.0 ** 63, 2.0 ** 64]))
        assert sorted(as_int) == sorted(as_float)
        # distinct huge values must not collapse
        assert len(set(as_float)) == 2
        # non-finite / non-integral floats unaffected
        inf = _hash64(np.array([np.inf, -np.inf, 1.5]))
        assert len(set(inf)) == 3
