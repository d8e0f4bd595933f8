"""URL canonicalization kernel + the url_canonical_dedup query."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ai_pdf_extraction_ray.functions.urls import canonicalize_urls

from conftest import SF_SMOKE

BASE = "https://h5.example.com/p/123"


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # the nine synthesis noise classes
        (BASE + "?utm_source=feed&utm_medium=rss", BASE),
        (BASE + "#section-2", BASE),
        ("HTTPS://H5.EXAMPLE.COM/p/123", BASE),
        ("https://h5.example.com:443/p/123", BASE),
        (BASE + "/", BASE),
        (BASE + "?b=2&a=1", BASE + "?a=1&b=2"),
        (BASE + "?utm_campaign=x&a=1#top", BASE + "?a=1"),
        ("https://h5.example.com//p/123", BASE),
        (BASE, BASE),
        # the recapture shape: noised canonical with params
        ("HTTPS://H5.EXAMPLE.COM/p/123?a=1&b=2#cached", BASE + "?a=1&b=2"),
        # generic rules beyond the synthetic classes
        ("http://EX.com:80//a//b/?fbclid=1&z=9&a=2#f", "http://ex.com/a/b?a=2&z=9"),
        ("https://ex.com", "https://ex.com/"),          # empty path -> "/"
        ("https://ex.com/", "https://ex.com/"),         # root slash kept
        ("https://ex.com/?gclid=x", "https://ex.com/"), # emptied query loses ?
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),  # non-default port
        ("http://ex.com:443/p", "http://ex.com:443/p"),  # 443 not http default
        ("not a url", "not a url"),                      # passthrough
    ],
)
def test_canonicalize_cases(raw: str, want: str) -> None:
    got = canonicalize_urls(pa.array([raw], pa.string())).to_pylist()[0]
    assert got == want


def test_canonicalize_null_and_chunked() -> None:
    chunked = pa.chunked_array([["https://A.b/x/"], [None]])
    got = canonicalize_urls(chunked).to_pylist()
    assert got == ["https://a.b/x", None]


def test_url_canonical_dedup_smoke(ray_session) -> None:
    """End-to-end at sf0.001 vs expectations computed straight from the
    doc_id table (independent of the SQL oracle's derivation)."""
    from ai_pdf_extraction_ray.pipelines.queries import q_url_canonical_dedup

    out = q_url_canonical_dedup(SF_SMOKE).to_pandas()
    d = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["doc_id"])
    ids = d.column("doc_id").to_pylist()

    n_docs = len(ids)
    n_recap = sum(1 for i in ids if i % 7 == 0)
    assert out["n_captures"].sum() == n_docs + n_recap
    assert out["n_pages"].sum() == n_docs        # recaptures all dedup away
    assert out["n_removed"].sum() == n_recap
    # latest capture kept: each recaptured page contributes +86400
    assert out["sum_kept_ts_s"].sum() == sum(ids) + 86400 * n_recap
    # param sort pinned: exactly the noise-class-5 docs keep ?a=1&b=2
    assert out["n_param_pages"].sum() == sum(1 for i in ids if i % 9 == 5)
    # hosts are unique and sorted
    assert list(out["host"]) == sorted(set(out["host"]))
