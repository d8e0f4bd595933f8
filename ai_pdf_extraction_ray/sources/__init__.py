"""Sources: deterministic Common-Crawl-style corpus synthesis + parquet IO."""

from .corpus import (  # noqa: F401
    invoice_fields_for,
    synthesize_pages_table,
    url_for,
    warc_ts_for,
)
