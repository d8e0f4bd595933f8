"""near_dup_clusters: connected components over verified near-dup pairs."""

from __future__ import annotations

import pandas as pd
import pytest


class TestClusterPairs:
    def test_transitive_chain_collapses(self):
        """a-b + b-c (no a-c edge) must form ONE cluster — the property
        pair listing alone cannot provide."""
        from ai_pdf_extraction_ray.stages.dedup import cluster_pairs

        label, size = cluster_pairs(pd.DataFrame({
            "doc_a": [10, 20, 50], "doc_b": [20, 30, 60]}))
        assert label[10] == label[20] == label[30] == 10
        assert label[50] == label[60] == 50
        assert size == {10: 3, 50: 2}

    def test_min_id_is_canonical_regardless_of_edge_order(self):
        from ai_pdf_extraction_ray.stages.dedup import cluster_pairs

        # edges deliberately ordered so the min id arrives last
        label, size = cluster_pairs(pd.DataFrame({
            "doc_a": [7, 5, 3], "doc_b": [9, 7, 5]}))
        assert set(label.values()) == {3}
        assert size == {3: 4}

    def test_empty_pairs(self):
        from ai_pdf_extraction_ray.stages.dedup import cluster_pairs

        label, size = cluster_pairs(pd.DataFrame({
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64")}))
        assert label == {} and size == {}


@pytest.fixture(scope="module")
def planted_corpus(tmp_path_factory):
    """40 unrelated docs + an exact-dup triple (40,41,42) + an LSH-certain
    near-dup pair (43,44): J(43,44) ~= 0.84, band recall ~1-1e-4."""
    base = " ".join(f"t0_{j}" for j in range(60))
    near = " ".join([f"t0_{j}" for j in range(55)] + [f"nx{j}" for j in range(5)])
    texts = [" ".join(f"u{i}_{j}" for j in range(60)) for i in range(40)]
    texts += [base, base, base, base, near]  # 40-44
    d = tmp_path_factory.mktemp("clusters")
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        d / "documents.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestNearDupClusters:
    def test_planted_groups_collapse(self, planted_corpus):
        from ai_pdf_extraction_ray.stages.dedup import near_dup_clusters

        out = near_dup_clusters(planted_corpus, threshold=0.5).to_pandas()
        out = out.set_index("doc_id").sort_index()
        # docs 40..44: exact triple 40,41,42 + near pair 43,44 all share the
        # long token prefix, so 43/44 also verify against 40 at J>=0.5 —
        # one transitive cluster rooted at 40
        assert set(out.loc[[40, 41, 42], "cluster_id"]) == {40}
        assert out.loc[44, "cluster_id"] == out.loc[43, "cluster_id"]
        assert out.loc[40, "is_canonical"] == 1
        assert (out.loc[[41, 42], "is_canonical"] == 0).all()

    def test_singletons_are_their_own_cluster(self, planted_corpus):
        from ai_pdf_extraction_ray.stages.dedup import near_dup_clusters

        out = near_dup_clusters(planted_corpus, threshold=0.5).to_pandas()
        singles = out[out.doc_id < 40]
        assert (singles["cluster_id"] == singles["doc_id"]).all()
        assert (singles["cluster_size"] == 1).all()
        assert (singles["is_canonical"] == 1).all()
        # exactly one canonical per cluster, covering every cluster
        canon = out[out.is_canonical == 1]
        assert sorted(canon["cluster_id"]) == sorted(out["cluster_id"].unique())
