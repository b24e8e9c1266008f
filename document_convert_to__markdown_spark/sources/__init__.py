"""Table IO: Iceberg when a catalog is configured, parquet fallback."""

from .tables import read_pages, read_pages_from_files, write_table

__all__ = ["read_pages", "read_pages_from_files", "write_table"]
