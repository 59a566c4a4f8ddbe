"""Source/sink format surface (reference parity: RubiX caches whatever the engine scans —
ORC in its stress suite, any Hadoop-FS-backed format in general)."""

from rubix_spark.sources.formats import read_table, write_table

__all__ = ["read_table", "write_table"]
