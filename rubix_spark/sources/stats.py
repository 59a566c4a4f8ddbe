"""Parquet footer statistics: answer metadata questions without decoding data.

MAX/MIN of a column is already recorded per column chunk in every parquet footer; a
full-table MAX therefore needs only the footers (KBs of metadata IO), not a scan — at
100 TB that's the difference between reading nothing and decoding the table. This is
the skip-work-you-already-did ethos of the reference's cache (``BookKeeper.java`` keeps
block status lookups cheap so reads never re-fetch what's known): the footer IS the
already-computed answer. The same mechanism backs Spark's own DSv2
``spark.sql.parquet.aggregatePushdown``; doing it driver-side keeps the v1 source path
(bucketed layouts, cache shim) everywhere else.

Trust rules — a footer value is used ONLY when it is provably the exact max:
- BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY (strings, decimals-as-binary) are never trusted:
  writers may store truncated bounds (parquet allows ``max_value`` to be an upper
  bound, and not every pyarrow exposes ``is_max_value_exact``).
- timestamp[ns] columns are not trusted (Python datetime carries micros; the exact
  nanosecond max is not representable — the events.ts unit has changed across driver
  fixture generations, invariant 13).
- a column with ANY chunk missing min/max stats falls back to the scan.

Untrusted columns are returned in ``scan`` and must be aggregated by the caller.
"""

from __future__ import annotations

import os

_UNTRUSTED_PHYSICAL = {"BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"}


def _parquet_files(path: str) -> list[str]:
    """Single-file and directory-of-part-files fixtures (invariant 14)."""
    if os.path.isdir(path):
        out = []
        for root, _, files in os.walk(path):
            out.extend(os.path.join(root, f) for f in sorted(files) if f.endswith(".parquet"))
        return out
    return [path]


def footer_max(path: str) -> tuple[dict[str, object], list[str]]:
    """(maxes, scan): per-column exact MAX from footer stats, plus the columns that
    need a real scan (untrusted physical type, ns timestamps, or absent stats)."""
    import pyarrow.parquet as pq

    maxes: dict[str, object] = {}
    bad: set[str] = set()
    names: list[str] = []
    for f in _parquet_files(path):
        pf = pq.ParquetFile(f)
        if not names:
            # ns-unit timestamps: exact max not representable as datetime (see module doc)
            import pyarrow as pa

            for field in pf.schema_arrow:
                names.append(field.name)
                if isinstance(field.type, pa.TimestampType) and field.type.unit == "ns":
                    bad.add(field.name)
        md = pf.metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            if g.num_rows == 0:
                continue
            for i in range(g.num_columns):
                c = g.column(i)
                name = c.path_in_schema
                if name in bad:
                    continue
                s = c.statistics
                if s is None or not s.has_min_max or c.physical_type in _UNTRUSTED_PHYSICAL:
                    bad.add(name)
                    maxes.pop(name, None)
                    continue
                v = s.max
                if name not in maxes or v > maxes[name]:
                    maxes[name] = v
    return maxes, [n for n in names if n not in maxes]
