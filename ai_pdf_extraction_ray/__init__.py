"""Ray-Data-native document-extraction engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference document-extraction service (``1M50RRY/ai-pdf-extraction``),
re-expressed as ``ray.data.Dataset`` pipelines over Arrow batches:

- ``schema``     — declarative typed schemas driving extraction + validation
                   (reference: app/backend/models.py:14-156)
- ``functions``  — scalar kernels: currency/date/number/boolean parsing, the
                   math-validation-rule DSL, record validation
                   (reference: app/backend/services/ai/validation.py)
- ``sources``    — deterministic Common-Crawl-style page corpus synthesis
                   (url, warc_ts, html, text, lang) and parquet IO
- ``stages``     — map_batches stages: HTML main-content extraction (streaming
                   DOM parse + text/link-density heuristics), PDF layout
                   parsing (content-stream interpretation, glyph clustering,
                   reading-order sort), dedup, text stats, similarity search
- ``pipelines``  — end-to-end Dataset pipelines and relational queries
- ``state``      — per-partition checkpoint manifests with lineage ids

Nothing here calls ``ray.init()``; sessions are owned by the caller
(driver / bench.py / tests).
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = "1.1.0"
"""Version string folded into checkpoint-manifest lineage ids; bump on any
change to extractor semantics (golden fixtures must be regenerated)."""
