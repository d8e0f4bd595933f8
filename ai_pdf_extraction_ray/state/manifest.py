"""Per-partition checkpoint manifests — idempotent resume for batch runs.

The reference persists per-document lifecycle statuses in Postgres
(PENDING/PROCESSING/COMPLETED/FAILED, reference models_db.py:34-40) but has
no resume path — a restarted batch loses the in-memory file list
(routers/batches.py:92). Here, resume is a first-class design (north rule):

- each output **shard** directory gets a ``_MANIFEST.json`` written
  atomically (tmp file + ``os.replace``) after its parquet parts land;
- the manifest carries a **lineage id** = sha256 over (input shard path,
  schema name+version, extractor version, engine version) — when code or
  schema change, the lineage changes and stale outputs stop passing as
  checkpoints (SURVEY.md §7.4 hard part #5);
- on re-run, a shard whose manifest exists, parses, and matches the
  expected lineage is **skipped**; everything else is recomputed and its
  directory overwritten;
- row counts + extraction metric sums ride in the manifest, replacing the
  reference's status-poll recomputation (routers/batches.py:460-467) with
  cheap file reads.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from .. import EXTRACTOR_VERSION, __version__

MANIFEST_NAME = "_MANIFEST.json"


def lineage_id(
    input_shard: str,
    schema_name: str = "",
    schema_version: str = "",
    extractor_version: str = EXTRACTOR_VERSION,
) -> str:
    payload = "\x00".join(
        [str(input_shard), schema_name, schema_version, extractor_version, __version__]
    )
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:16]


def write_manifest_atomic(shard_dir: str, manifest: dict[str, Any]) -> str:
    """Write ``_MANIFEST.json`` via tmp+rename (atomic on POSIX)."""
    os.makedirs(shard_dir, exist_ok=True)
    path = os.path.join(shard_dir, MANIFEST_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def read_manifest(shard_dir: str) -> dict[str, Any] | None:
    path = os.path.join(shard_dir, MANIFEST_NAME)
    try:
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    except (OSError, ValueError):
        # ValueError covers JSONDecodeError AND UnicodeDecodeError — any
        # unreadable manifest means "recompute this shard", never a crash
        return None


def manifest_is_valid(shard_dir: str, expected_lineage: str) -> bool:
    m = read_manifest(shard_dir)
    return bool(m) and m.get("lineage") == expected_lineage and "rows" in m
