"""Property-based tests (hypothesis): round-trip invariants of the
generator/extractor pair and the scalar kernels."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ai_pdf_extraction_ray.functions.rules import evaluate_rule
from ai_pdf_extraction_ray.functions.scalars import parse_currency, parse_date
from ai_pdf_extraction_ray.sources.corpus import (
    build_html,
    build_multipage_pdf,
    build_pdf,
    synthesize_pages_batch,
)
from ai_pdf_extraction_ray.stages.html_extract import extract_html
from ai_pdf_extraction_ray.stages.pdf_extract import extract_pdf

# text that survives block stripping: no edge whitespace, no newlines,
# printable, at least one non-space char
# NOTE: block canonicalization strips *unicode* whitespace at block edges
# (str.strip()), so round-trip holds exactly for strip-stable texts — a text
# made only of \xa0 etc. is canonicalized away by design (hypothesis found
# this boundary; see html_extract._flush).
_word = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cc", "Cs", "Zl", "Zp"),
        exclude_characters=" ",
    ),
    min_size=1,
    max_size=12,
).filter(lambda w: w.strip() == w and w.strip())
_text = st.lists(_word, min_size=1, max_size=60).map(" ".join)

# pdf-safe text: latin-1 encodable words (content streams are latin-1)
_pdf_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=255, exclude_characters="\xad"),
    min_size=1, max_size=10,
).filter(lambda w: w.strip() == w and w)
_pdf_text = st.lists(_pdf_word, min_size=1, max_size=80).map(" ".join)


class TestHtmlRoundTrip:
    @settings(max_examples=200, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=10_000), text=_text)
    def test_extract_recovers_embedded_text(self, doc_id: int, text: str):
        payload = build_html(doc_id, text, "en", len(text))
        rec = extract_html(payload)
        assert rec["error"] is None
        assert rec["text"] == text

    @settings(max_examples=50, deadline=None)
    @given(text=_text)
    def test_spans_partition_output(self, text: str):
        rec = extract_html(build_html(7, text, "en", len(text)))
        # spans tile the output text exactly with 2-char gaps
        pos = 0
        for s in rec["spans"]:
            assert s["start"] == pos
            assert rec["text"][s["start"]:s["end"]]
            pos = s["end"] + 2
        assert pos - 2 == len(rec["text"])


class TestPdfRoundTrip:
    @settings(max_examples=100, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=10_000), text=_pdf_text)
    def test_extract_recovers_pdf_text(self, doc_id: int, text: str):
        rec = extract_pdf(build_pdf(doc_id, text))
        assert rec["error"] is None
        assert rec["text"] == text

    @settings(max_examples=30, deadline=None)
    @given(paras=st.lists(_pdf_text, min_size=1, max_size=5))
    def test_multipage_pages_in_order(self, paras: list[str]):
        rec = extract_pdf(build_multipage_pdf(1, paras))
        assert rec["text"] == "\n\n".join(paras)


class TestScalarProperties:
    @settings(max_examples=200, deadline=None)
    @given(cents=st.integers(min_value=0, max_value=10**12))
    def test_currency_format_parse_roundtrip(self, cents: int):
        s = f"${cents // 100:,}.{cents % 100:02d}"
        assert parse_currency(s) == cents / 100.0

    @settings(max_examples=100, deadline=None)
    @given(
        y=st.integers(min_value=1000, max_value=9999),
        m=st.integers(min_value=1, max_value=12),
        d=st.integers(min_value=1, max_value=28),
    )
    def test_date_iso_roundtrip(self, y: int, m: int, d: int):
        iso = f"{y:04d}-{m:02d}-{d:02d}"
        assert parse_date(iso) == iso
        assert parse_date(f"{m:02d}/{d:02d}/{y:04d}") == iso  # US precedence

    @settings(max_examples=100, deadline=None)
    @given(
        a=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        b=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    )
    def test_rule_true_equations_always_pass(self, a: float, b: float):
        ok, _, _ = evaluate_rule("t == a + b", {"a": a, "b": b, "t": a + b})
        assert ok

    @settings(max_examples=100, deadline=None)
    @given(junk=st.text(max_size=40))
    def test_parsers_never_raise(self, junk: str):
        parse_currency(junk)
        parse_date(junk)


class TestGeneratorDeterminism:
    @settings(max_examples=20, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=100_000), text=_text)
    def test_pages_batch_pure(self, doc_id: int, text: str):
        import pyarrow as pa

        batch = pa.table({
            "doc_id": pa.array([doc_id], pa.int64()),
            "text": pa.array([text], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        })
        assert synthesize_pages_batch(batch).equals(synthesize_pages_batch(batch))


class TestClusterPairsProperties:
    """Union-find vs brute-force transitive closure on random edge sets."""

    @given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                    min_size=0, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_matches_brute_force_closure(self, edges: list[tuple[int, int]]):
        import pandas as pd

        from ai_pdf_extraction_ray.stages.dedup import cluster_pairs

        edges = [(a, b) for a, b in edges if a != b]
        label, size = cluster_pairs(pd.DataFrame({
            "doc_a": [a for a, _ in edges],
            "doc_b": [b for _, b in edges]}))
        # brute force: repeated relaxation until fixpoint
        nodes = {n for e in edges for n in e}
        ref = {n: n for n in nodes}
        changed = True
        while changed:
            changed = False
            for a, b in edges:
                lo = min(ref[a], ref[b])
                for n in (a, b):
                    if ref[n] != lo:
                        # relabel the whole component, not just the endpoint
                        old = ref[n]
                        for k in ref:
                            if ref[k] == old:
                                ref[k] = lo
                        changed = True
        assert label == ref
        from collections import Counter

        assert size == Counter(ref.values())


class TestBloomProperties:
    @given(st.lists(st.integers(-2**40, 2**40), min_size=0, max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_never_false_negative(self, keys: list[int]):
        import numpy as np

        from ai_pdf_extraction_ray.functions.bloom import BloomFilter

        bf = BloomFilter()
        arr = np.array(keys, dtype=np.int64) if keys else np.array([], dtype=np.int64)
        bf.add_many(arr)
        if keys:
            assert bf.contains_many(arr).all()

    @given(st.lists(st.integers(0, 10**6), min_size=1, max_size=200),
           st.lists(st.integers(0, 10**6), min_size=1, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_merge_equals_union_build(self, ka: list[int], kb: list[int]):
        import numpy as np

        from ai_pdf_extraction_ray.functions.bloom import BloomFilter

        a, b, u = BloomFilter(), BloomFilter(), BloomFilter()
        a.add_many(np.array(ka, dtype=np.int64))
        b.add_many(np.array(kb, dtype=np.int64))
        u.add_many(np.array(ka + kb, dtype=np.int64))
        a.merge(b)
        assert (a.bits == u.bits).all()
