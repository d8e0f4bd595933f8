"""Run state: per-partition checkpoint manifests with lineage ids."""

from .manifest import (  # noqa: F401
    lineage_id,
    manifest_is_valid,
    read_manifest,
    write_manifest_atomic,
)
