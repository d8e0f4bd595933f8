"""functions/tokenize.py: the Arrow RE2 tokenizer that replaced the
per-token Python loops (heavy_hitters, top_terms_per_lang, token_quality,
unigram/tfidf, vocab_bigrams — judge round-4 finding #2). The contract is
EXACT parity with ``re.compile(r"\\S+").findall(text.lower())``."""

from __future__ import annotations

import re

import numpy as np
from ai_pdf_extraction_ray.functions.tokenize import lower_parity
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_pdf_extraction_ray.functions.tokenize import (
    PY_WS_CHARS,
    flat_tokens,
    per_row_token_stats,
    token_counts,
)

_TOKEN = re.compile(r"\S+")


def _expected(texts):
    return [(i, t) for i, s in enumerate(texts)
            for t in _TOKEN.findall(lower_parity(s or ""))]


class TestWhitespaceClass:
    def test_class_is_exactly_python_re_whitespace(self):
        """Regenerate the full Unicode \\s set and compare — RE2's \\s is
        ASCII-only, so the explicit class is what keeps the Arrow path
        token-identical to the Python tokenizer."""
        ws = {chr(c) for c in range(0x110000) if re.match(r"\s", chr(c))}
        assert set(PY_WS_CHARS) == ws
        assert len(PY_WS_CHARS) == len(ws)  # no duplicates


class TestFlatTokens:
    def test_basic_parity(self):
        texts = ["Hello WORLD hello", None, "", "  a\xa0b c  ",
                 "x\tx\nx y", "　only　", "nospace"]
        toks, rows = flat_tokens(pa.array(texts))
        assert list(zip(rows.tolist(), toks.to_pylist())) == _expected(texts)

    def test_chunked_input(self):
        col = pa.chunked_array([pa.array(["a b", "c"]), pa.array(["d e f"])])
        toks, rows = flat_tokens(col)
        assert toks.to_pylist() == ["a", "b", "c", "d", "e", "f"]
        assert rows.tolist() == [0, 0, 1, 2, 2, 2]

    @settings(max_examples=200, deadline=None)
    @given(st.lists(
        st.one_of(st.none(), st.text(
            alphabet=st.characters(max_codepoint=0x3001), max_size=40)),
        max_size=8))
    def test_property_parity_with_python_tokenizer(self, texts):
        toks, rows = flat_tokens(pa.array(texts, pa.string()))
        assert list(zip(rows.tolist(), toks.to_pylist())) == _expected(texts)

    def test_empty_column(self):
        toks, rows = flat_tokens(pa.array([], pa.string()))
        assert len(toks) == 0 and len(rows) == 0

    def test_turkish_capital_i_parity(self):
        """U+0130 'İ' is Unicode's one unconditional one-to-many lowercase
        mapping: Python str.lower() expands it to 'i'+U+0307 while Arrow
        utf8_lower and DuckDB lower() map it to plain 'i'. lower_parity is
        the scalar-side bridge — the Arrow path and the scalar reference
        must agree on it (review finding: the divergence flipped
        distinct-token counts for Turkish-script text)."""
        texts = ["İstanbul İ İİ x", "plain"]
        toks, rows = flat_tokens(pa.array(texts))
        assert list(zip(rows.tolist(), toks.to_pylist())) == _expected(texts)
        assert lower_parity("İ") == "i"          # matches Arrow/DuckDB
        assert "İ".lower() == "i̇"          # the Python divergence

    def test_final_sigma_parity(self):
        """U+03A3 'Σ' is the one CONTEXTUAL lowercase mapping Python
        applies (word-final -> 'ς'); Arrow/DuckDB always use the simple
        mapping 'σ'. lower_parity pre-maps the capital; an existing
        lowercase 'ς' is untouched by lowering on every engine and must
        pass through (review finding)."""
        import pyarrow.compute as pc

        texts = ["ΑΣ ΣΟΦΟΣ Σ", "ς stays ς"]
        toks, rows = flat_tokens(pa.array(texts))
        assert list(zip(rows.tolist(), toks.to_pylist())) == _expected(texts)
        assert "ΑΣ".lower() == "ας"              # Python Final_Sigma...
        assert lower_parity("ΑΣ") == "ασ"        # ...vs the simple mapping
        assert lower_parity("ΑΣ") == pc.utf8_lower(pa.scalar("ΑΣ")).as_py()
        assert lower_parity("ς") == "ς"


class TestAggregates:
    def test_token_counts(self):
        tk, ct = token_counts(pa.array(["a b a", "B a", None]))
        assert dict(zip(tk.to_pylist(), ct.to_pylist())) == {"a": 3, "b": 2}

    def test_per_row_token_stats(self):
        n, d = per_row_token_stats(pa.array(["a b a", "", None, "x y z"]))
        assert n.tolist() == [3, 0, 0, 3]
        assert d.tolist() == [2, 0, 0, 3]
