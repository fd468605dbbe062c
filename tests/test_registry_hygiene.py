"""Registry growth guards (VERDICT r9 item 8) + the decimal-rendering
regression from the r9 driver window.

Three classes of rot these pin down as the registry grows past 197
entries:

* **File ceilings** — the r9 hygiene split the 8.4k-line queries.py
  into ``queries/_part1..4``; without a guard the "append to the last
  chunk" rule re-grows a monolith.
* **Registry/oracle/window parity** — every oracle key must name a
  registered query, the window-ordering lists (_PROMOTED/_DEMOTED) must
  only name registered queries, and the driver-facing entry module must
  expose the same dicts the package builds.
* **Decimal rendering** — the ONE red driver row of round 9
  (``ivm_extrema_orders``) was a query surfacing raw ``DECIMAL(18,2)``
  columns: values were cell-for-cell exact against the oracle, but the
  driver's value hasher canonicalizes Spark ``Decimal`` objects
  differently from the DuckDB oracle's rendering. The registry-wide
  discipline (stated in ``queries/_base.py`` since r1) is: aggregate in
  exact DECIMAL, SURFACE as DOUBLE (or round). This test makes the
  discipline mechanical: no registered query may output a DecimalType
  column. Schema derivation is lazy — this sweeps all ~200 queries in
  seconds without executing them.
"""

import os
import sys

import pytest
from pyspark.sql.types import DecimalType

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod
from mysql_syncer_spark.queries import _DEMOTED, _PROMOTED, _ORACLES, _QUERIES

QUERIES_PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "mysql_syncer_spark",
    "queries",
)

#: per-file ceiling for registry chunks — at ~2.1k lines today a 2.6k
#: ceiling leaves headroom for a round of additions while forcing a
#: _part5 before any chunk doubles.
CHUNK_LINE_CEILING = 2600


def test_chunk_file_ceilings():
    over = {}
    for fname in sorted(os.listdir(QUERIES_PKG)):
        if not fname.endswith(".py"):
            continue
        path = os.path.join(QUERIES_PKG, fname)
        with open(path) as f:
            n = sum(1 for _ in f)
        if n > CHUNK_LINE_CEILING:
            over[fname] = n
    assert not over, (
        f"registry chunks over the {CHUNK_LINE_CEILING}-line ceiling: "
        f"{over} — start a new _partN chunk instead of growing these"
    )


def test_oracle_keys_subset_of_registry():
    orphans = set(_ORACLES) - set(_QUERIES)
    assert not orphans, f"oracle SQL for unregistered queries: {orphans}"


def test_window_lists_name_registered_queries():
    missing = [n for n in _PROMOTED + _DEMOTED if n not in _QUERIES]
    assert not missing, f"_PROMOTED/_DEMOTED name unknown queries: {missing}"


def test_promoted_fits_driver_window():
    # the driver checks the FIRST 50 queries() entries; _PROMOTED is
    # pulled to the front wholesale, so a 51st promotion would silently
    # push a promoted row OUT of the very window it was promoted into.
    assert len(set(_PROMOTED)) <= 50, (
        f"{len(set(_PROMOTED))} promoted > 50-row driver window — "
        "retire old promotions to _DEMOTED when rotating"
    )


def test_entry_module_matches_package():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert list(qs) == list(entrymod.queries())  # stable order
    assert set(os_) <= set(qs)
    assert len(qs) == len(_QUERIES)


def test_every_query_callable_and_every_oracle_nonempty():
    for name, fn in _QUERIES.items():
        assert callable(fn), name
    for name, sql in _ORACLES.items():
        assert isinstance(sql, str) and sql.strip(), name


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_decimal_output_columns(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    leaked = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    assert not leaked, (
        f"{name} surfaces DecimalType columns {leaked}: aggregate in "
        "DECIMAL, surface as DOUBLE/rounded (r9 driver-hash lesson — "
        "see ivm_extrema_orders docstring)"
    )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_complex_output_columns(spark, sf_dir, name):
    """r10 driver lesson (``bpe_tokens_docs`` red row): the driver's
    pandas canonicalizer ``sort_values`` cannot hash list cells, so an
    array/map/struct output column crashes even the rows-only check.
    Registry discipline: every result column is a scalar — serialize
    samples with ``concat_ws``, surface vectors as component columns
    plus a norm checksum (see pca_whiten_embeddings)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = _QUERIES[name](spark, sf_dir)
    leaked = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not leaked, (
        f"{name} surfaces complex-typed columns {leaked}: the driver "
        "canonicalizer cannot hash them (r10 bpe_tokens_docs lesson)"
    )
