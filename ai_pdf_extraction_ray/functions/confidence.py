"""Logprob-based confidence (reference A3) — exact edge semantics.

The engine's primary confidence is the deterministic text-density score
(stages/html_extract.py — the north star replaces the LLM kernel), but the
reference's logprob path (services/ai/extraction.py:89-125) has edge
semantics a user migrating pipelines may depend on; they are preserved here
verbatim:

- no logprobs payload at all            -> 0.75 (default)
- payload present but no usable values  -> 0.75
- otherwise geometric mean via exp(mean(logprob))
- the mean logprob is clamped at -10 BEFORE exponentiation (~5e-5 floor)
- result clamped to [0, 1]

Entries may be bare floats, None, dicts with a ``logprob`` key (the wire
shape of a JSON-decoded response), or objects with a ``logprob`` attribute
(the reference receives OpenAI token objects; None logprobs are skipped).
"""

from __future__ import annotations

import math
from typing import Any

DEFAULT_CONFIDENCE = 0.75
_MIN_AVG_LOGPROB = -10.0


def confidence_from_logprobs(logprobs_data: list[Any] | None) -> float:
    """Geometric-mean confidence with the reference's exact clamps."""
    if not logprobs_data:
        return DEFAULT_CONFIDENCE

    log_probs: list[float] = []
    for token_data in logprobs_data:
        if isinstance(token_data, dict):
            value = token_data.get("logprob")
        else:
            value = getattr(token_data, "logprob", token_data)
        if value is not None and isinstance(value, (int, float)) and not isinstance(value, bool):
            log_probs.append(float(value))

    if not log_probs:
        return DEFAULT_CONFIDENCE

    avg_logprob = max(sum(log_probs) / len(log_probs), _MIN_AVG_LOGPROB)
    return max(0.0, min(1.0, math.exp(avg_logprob)))
