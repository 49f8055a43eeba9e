"""Query registry: pairs each named Spark query with its DuckDB oracle SQL.

Every operator from SURVEY.md §2 that we claim as implemented registers
here: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string run
against the same parquet tables. The driver compares the two
(row count + schema + order-insensitive value hash).

Conventions that keep the comparison exact:

- every computed/aggregate column is aliased identically on both sides;
- floating-point aggregates are ``round``-ed on BOTH sides (absorbs
  summation-order differences between engines);
- any query whose row *membership* depends on ordering (top-k, limit)
  uses a deterministic total order (value, then key).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once (side-effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from anime_data_pipeline_spark import queries as _q  # noqa: F401

    _LOADED = True


def _noop(*_a: Any, **_k: Any) -> None:  # pragma: no cover
    return None
