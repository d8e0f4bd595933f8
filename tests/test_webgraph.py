"""Web-graph lane: outlink harvest kernel + query, PageRank iteration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ai_pdf_extraction_ray.pipelines.queries import (
    PAGERANK_BUCKETS,
    PAGERANK_DAMPING,
    PAGERANK_ITERS,
    PAGERANK_OUT_DEG,
    _boilerplate_frag_link_count,
    _boilerplate_link_count,
    _outlink_targets_batch,
)
from ai_pdf_extraction_ray.sources.corpus import host_id_for, is_pdf_row

from conftest import SF_SMOKE


class TestOutlinkKernel:
    def _run(self, url: str, html: bytes) -> list[str]:
        out = _outlink_targets_batch(pa.table({
            "url": pa.array([url], pa.string()),
            "html": pa.array([html], pa.binary()),
        }))
        return out.column("target").to_pylist()

    def test_resolution_classes(self) -> None:
        page = "https://h3.example.com/p/42"
        html = (b'<html><a href="/news">n</a> <a href="#top">t</a> '
                b'<a href="https://other.org/X/">abs</a> '
                b'<a href="">self</a> <a href="news">rel</a> '
                b'<a href="//cdn.example.net/lib.js">proto</a> '
                b'<a href="?page=2">query</a></html>')
        assert self._run(page, html) == [
            "https://h3.example.com/news",
            page,                      # fragment-only -> the page itself
            "https://other.org/X",     # absolute passes through, canonical
            page,                      # empty href -> the page itself (RFC)
            "https://h3.example.com/p/news",     # bare-relative: page dir
            "https://cdn.example.net/lib.js",    # protocol-relative
            page + "?page=2",          # query-only: page path + query
        ]

    def test_relative_on_pathless_page(self) -> None:
        # a path-less page url resolves bare-relative hrefs against "/"
        assert self._run("https://h1.example.com",
                         b'<a href="about">a</a>') == [
            "https://h1.example.com/about"]

    def test_frag_link_count_invariant_across_variants(self) -> None:
        from ai_pdf_extraction_ray.pipelines.queries import (
            boilerplate_frag_link_count_variants)

        assert (boilerplate_frag_link_count_variants()
                == {_boilerplate_frag_link_count()})

    def test_pdf_payload_emits_nothing(self) -> None:
        assert self._run("https://h1.example.com/p/7",
                         b'%PDF-1.4 href="/x"') == []

    def test_linkless_html_emits_nothing(self) -> None:
        assert self._run("https://h1.example.com/p/8", b"<p>plain</p>") == []


class TestOutlinkGraphQuery:
    def test_against_corpus_structure(self, ray_session) -> None:
        """End-to-end at sf0.001 vs expectations derived from the doc_id
        table + the probe-page link constants (independent of the SQL
        oracle's host-grouping derivation)."""
        from ai_pdf_extraction_ray.pipelines.queries import q_outlink_graph

        out = q_outlink_graph(SF_SMOKE).to_pandas().set_index("host")
        ids = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
        pages: dict[str, int] = {}
        for i in ids:
            if not is_pdf_row(i):
                h = f"h{host_id_for(i)}.example.com"
                pages[h] = pages.get(h, 0) + 1

        total = _boilerplate_link_count()
        frag = _boilerplate_frag_link_count()
        assert set(out.index) == set(pages)
        for host, n in pages.items():
            row = out.loc[host]
            assert row["n_targets"] == (total - frag) + n
            assert row["n_inlinks"] == total * n
            assert row["max_indegree"] == max(n, frag)
            assert row["n_self_targets"] == n


class TestTriangleCount:
    def test_against_bruteforce(self, ray_session) -> None:
        from ai_pdf_extraction_ray.pipelines.queries import (
            TRIANGLE_BUCKETS, q_triangle_count)

        out = q_triangle_count(SF_SMOKE).to_pandas()
        n = len(pq.read_table(f"{SF_SMOKE}/documents.parquet",
                              columns=["doc_id"]))
        # independent brute force over the same arithmetic graph
        adj: dict[int, set[int]] = {v: set() for v in range(n)}
        for i in range(n):
            for j in ((i + 1) % n, (i + 2) % n, (i * i + i) % n):
                if i != j:
                    adj[i].add(j)
                    adj[j].add(i)
        want: dict[int, int] = {}
        deg = {v: len(adj[v]) for v in range(n)}
        for a in range(n):
            for b_ in (x for x in adj[a] if x > a):
                for c in (x for x in (adj[a] & adj[b_]) if x > b_):
                    # attributed to the min-(degree, id) vertex, matching
                    # the engine's degree orientation
                    ctr = min((a, b_, c), key=lambda v: (deg[v], v))
                    want[ctr % TRIANGLE_BUCKETS] = (
                        want.get(ctr % TRIANGLE_BUCKETS, 0) + 1)
        got = dict(zip(out["bucket"], out["n_triangles"]))
        assert got == want
        # the two successor maps plant a triangle at every vertex
        assert sum(got.values()) >= n


class TestPageRank:
    @staticmethod
    def _reference_ranks(n: int) -> np.ndarray:
        """Plain-numpy power iteration, independent of the Ray shapes."""
        i = np.arange(n, dtype=np.int64)
        dsts = [(2 * i + 1) % n, (3 * i + 7) % n, (i * i + i) % n]
        r = np.full(n, 1.0 / n)
        for _ in range(PAGERANK_ITERS):
            w = np.zeros(n)
            for dst in dsts:
                np.add.at(w, dst, r / PAGERANK_OUT_DEG)
            r = (1.0 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * w
        return r

    def test_against_numpy_reference(self, ray_session) -> None:
        from ai_pdf_extraction_ray.pipelines.queries import q_pagerank

        out = q_pagerank(SF_SMOKE).to_pandas()
        n = len(pq.read_table(f"{SF_SMOKE}/documents.parquet",
                              columns=["doc_id"]))
        r = self._reference_ranks(n)
        bucket = np.arange(n, dtype=np.int64) % PAGERANK_BUCKETS

        assert list(out["bucket"]) == list(range(PAGERANK_BUCKETS))
        assert out["n_docs"].sum() == n
        # rank mass is conserved (constant out-degree: no dangling loss)
        assert abs(out["sum_rank"].sum() - 1.0) < 1e-6
        for b in range(PAGERANK_BUCKETS):
            want_sum = r[bucket == b].sum()
            want_max = r[bucket == b].max()
            got = out[out["bucket"] == b].iloc[0]
            assert abs(got["sum_rank"] - want_sum) < 1e-9
            assert abs(got["max_rank"] - want_max) < 1e-9
        # the quadratic map makes the distribution genuinely skewed
        assert r.max() > 2.0 * r.min()
