"""BloomFilter: no false negatives, bounded false positives, OR-merge."""

from __future__ import annotations

import numpy as np

from ai_pdf_extraction_ray.functions.bloom import BloomFilter


class TestBloomFilter:
    def test_no_false_negatives(self):
        bf = BloomFilter()
        keys = np.arange(0, 20_000, 7, dtype=np.int64)
        bf.add_many(keys)
        assert bf.contains_many(keys).all()

    def test_false_positive_rate_bounded(self):
        bf = BloomFilter()
        bf.add_many(np.arange(2_000, dtype=np.int64))
        probes = np.arange(1_000_000, 1_100_000, dtype=np.int64)  # disjoint
        fp = bf.contains_many(probes).mean()
        # theory ~1e-7 at these parameters; allow orders of slack
        assert fp < 1e-3

    def test_merge_is_union(self):
        a, b = BloomFilter(), BloomFilter()
        ka = np.arange(100, dtype=np.int64)
        kb = np.arange(500, 600, dtype=np.int64)
        a.add_many(ka)
        b.add_many(kb)
        a.merge(b)
        assert a.contains_many(ka).all()
        assert a.contains_many(kb).all()

    def test_serialization_round_trip(self):
        bf = BloomFilter()
        keys = np.array([3, 1_000_003, -17, 2**40], dtype=np.int64)
        bf.add_many(keys)
        back = BloomFilter.from_bytes(bf.to_bytes())
        assert (back.bits == bf.bits).all()
        assert back.contains_many(keys).all()

    def test_deterministic_across_instances(self):
        a, b = BloomFilter(), BloomFilter()
        keys = np.array([42, 4242, 424242], dtype=np.int64)
        a.add_many(keys)
        b.add_many(keys)
        assert (a.bits == b.bits).all()
