"""Decorator-based registry mapping query names to DataFrame programs and
(optionally) DuckDB oracle SQL.

A query registered without an oracle gets the driver's weaker rows-only
check — reserved for genuinely non-SQL-expressible ops (stateful streaming,
multi-step pipelines, LSH internals)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
