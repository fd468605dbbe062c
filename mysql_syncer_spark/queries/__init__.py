"""Query registry facade — the driver contract's single import point.

The 188-entry registry (each Spark query paired with its DuckDB oracle)
lived in one 8.4k-line queries.py through round 8; round 9 split it into
this package for hygiene WITHOUT changing the contract:

* ``from mysql_syncer_spark import queries`` still works everywhere;
* ``queries.queries()`` / ``queries.oracle_sql()`` return the same
  dicts in the same order (registration order = the chunk import order
  below; the driver-window head is pinned by _PROMOTED/_DEMOTED in
  ``_base`` exactly as before);
* the split-time registry fingerprint (names, order, oracle SQL text)
  was asserted byte-identical to the monolith.

Layout: ``_base`` holds the registry machinery, shared helpers and the
window ordering lists; ``_part1..4`` hold the registrations in their
original file order. New registrations append to the last chunk (or a
new ``_part5``) and to ``_DEMOTED``/``_PROMOTED`` per the standing
window discipline.
"""

from mysql_syncer_spark.queries._base import (  # noqa: F401
    ORDERS_COLS,
    QueryFn,
    TABLE_KINDS,
    _DEMOTED,
    _ORACLES,
    _PROMOTED,
    _QUERIES,
    _driver_order,
    _register,
    oracle_sql,
    queries,
)

# registration happens on import, in this exact order — the contract
from mysql_syncer_spark.queries import _part1  # noqa: E402,F401
from mysql_syncer_spark.queries import _part2  # noqa: E402,F401
from mysql_syncer_spark.queries import _part3  # noqa: E402,F401
from mysql_syncer_spark.queries import _part4  # noqa: E402,F401
from mysql_syncer_spark.queries import _part5  # noqa: E402,F401

# attribute compatibility with the pre-split module: every registered
# query function is reachable as ``queries.<name>`` (the driver entry
# stub and older callers use attribute access)
import sys as _sys

_self = _sys.modules[__name__]
for _name, _fn in _QUERIES.items():
    setattr(_self, _name, _fn)
del _sys, _self, _name, _fn
