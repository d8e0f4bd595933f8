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


class TestCanonicalizeProperties:
    """Hypothesis: idempotence over url-ish strings — the defining property
    of a canonicalizer (two captures agree iff ONE application agrees)."""

    from hypothesis import given, settings, strategies as st

    _seg = st.text(
        alphabet="abcXYZ09._~%-", min_size=0, max_size=6)
    _urlish = st.builds(
        lambda scheme, host, port, segs, query, frag:
            f"{scheme}://{host}{port}" + "".join("/" + s for s in segs)
            + (f"?{query}" if query is not None else "")
            + (f"#{frag}" if frag is not None else ""),
        st.sampled_from(["http", "https", "HTTP", "HTTPS", "ftp"]),
        st.sampled_from(["Ex.COM", "h3.example.com", "a.b", "x"]),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.lists(_seg, max_size=4),
        st.one_of(st.none(), st.sampled_from(
            ["", "b=2&a=1", "utm_source=x", "a=1&&b=2", "fbclid=1&z=9",
             "gclid", "=", "a==b"])),
        st.one_of(st.none(), st.sampled_from(["", "frag", "a/b?c"])),
    )

    @given(st.one_of(_urlish, st.text(max_size=40)))
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, raw: str) -> None:
        once = canonicalize_urls(pa.array([raw], pa.string())).to_pylist()[0]
        twice = canonicalize_urls(pa.array([once], pa.string())).to_pylist()[0]
        assert twice == once


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
