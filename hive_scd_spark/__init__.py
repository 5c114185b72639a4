"""hive_scd_spark — a PySpark-native rebuild of the query and
data-processing capabilities of jwills/hive-scd ("Type 7" SCD).

The reference (see ``/root/reference``, surveyed in SURVEY.md) applies
SQL UPDATE/DELETE statements from a ``.updates`` file to dimension rows
*at read time*, with an as-of timestamp selecting which statements
apply.  The reference replays every row through an embedded H2 database
(``SQLUpdater.java:161-175``); this rebuild instead **compiles the DML
into Catalyst column expressions** on the driver, so the whole replay
participates in whole-stage codegen, predicate pushdown and column
pruning — the per-row interpreter is gone.

Public API
----------
- :func:`parse_updates` / :func:`parse_script` — lex+parse a ``.updates``
  script into :class:`Stmt` objects (reference ``SQLUpdater.java:121-159``).
- :func:`apply_statements` — fold parsed statements over a DataFrame as
  ``when/otherwise`` projections and filters (reference apply loop
  ``SQLUpdater.java:161-175``).
- :func:`read_scd` — read a directory of data files + its ``.updates``
  as-of a time, per partition directory (reference
  ``SQLUpdater.java:107-119``).
- :func:`snapshot` — materialize the as-of view (the README's
  "current snapshot + compaction" pattern, reference ``README.md:239-244``).
- :func:`resolve_as_of` / :func:`parse_scd_time` — ``scd.time`` semantics
  (reference ``SQLUpdater.java:95-108``).
"""

from hive_scd_spark.updates import (
    Stmt,
    ScdScriptError,
    parse_scd_time,
    parse_updates,
    parse_script,
)
from hive_scd_spark.scd import (
    apply_statements,
    compact,
    read_scd,
    resolve_as_of,
    scd2_history,
    scd_view,
    snapshot,
)

__all__ = [
    "Stmt",
    "ScdScriptError",
    "parse_scd_time",
    "parse_updates",
    "parse_script",
    "apply_statements",
    "compact",
    "read_scd",
    "resolve_as_of",
    "scd2_history",
    "scd_view",
    "snapshot",
]

__version__ = "0.1.0"
