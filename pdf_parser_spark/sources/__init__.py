"""IO facade: Iceberg-when-available / parquet-fallback table access,
plus the lineage sidecar powering checkpoint-resume."""

from .io import TableIO  # noqa: F401
