"""Table IO: Iceberg when a catalog is configured, parquet fallback."""

from .tables import read_pages, write_table

__all__ = ["read_pages", "write_table"]
