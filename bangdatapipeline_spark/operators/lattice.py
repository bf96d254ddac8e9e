"""The ONE cents-lattice spelling, shared across operator modules.

r10 review found ``round()`` and ``floor(+0.5)`` variants coexisting
across the daily rollups; they agree only for non-negative values —
``round`` is half-away-from-zero, ``floor(x+0.5)`` half-toward-+inf —
so a signed-data copy of the wrong variant silently forks the lattice.
r11 unified timeseries.py's six oracles onto one interpolated constant;
r12 (VERDICT r11 task 3) hoists that constant here and parameterizes it
so the literal copies in aggregates/curation/dataquality/incremental/
layout_ops/relational interpolate the same spelling. Editing the
lattice now means editing exactly one function.

``floor(x*100 + 0.5)`` is the repo convention (docs/dialect_notes.md).
Exceptions that deliberately do NOT use this helper: inference.py and
parts of layout_ops.py use the ``round(x*100)`` spelling instead —
consistently on BOTH their Spark and oracle sides, over non-negative
domains where the two lattices agree — so they pair internally. Do not
mix spellings within one operator's Spark/oracle pairing, and do not
"fix" those files by swapping spellings on one side only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def cents_sql(expr: str = "value", as_type: str = "BIGINT") -> str:
    """SQL (DuckDB + Spark dialect-shared) cents-lattice spelling for a
    simple column reference. ``as_type`` widens the per-row cast where a
    downstream product would overflow int64 (e.g. HUGEINT for third
    moments of ~1e8-cent values)."""
    return f"CAST(floor({expr} * 100 + 0.5) AS {as_type})"


def cents_col(col: Column) -> Column:
    """Spark-side twin of :func:`cents_sql` (exact integer cents)."""
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")
