"""Probe registry plumbing.

A Probe is one declared operator/query from SURVEY.md §2: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (usually) an equivalent
ANSI SQL string for the DuckDB oracle. The driver hash-compares both at
sf0.01 (order-insensitive; columns sorted by name) — so every computed
column is aliased identically on both sides, and float-bearing
aggregates go through exact decimal arithmetic (see relational.py
docstring).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Probe:
    name: str
    survey_ref: str  # e.g. "B7" — SURVEY.md §2 row this implements
    spark: SparkFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


def all_probes() -> dict[str, Probe]:
    """Full registry, keyed by probe name (stable across rounds)."""
    from . import (
        corpus,
        curation,
        events,
        formats,
        graph,
        imagedup,
        lake,
        llm,
        parity,
        relational,
        retrieval,
        sketch,
        tpch_extra,
        udf_tier,
        warehouse,
    )

    out: dict[str, Probe] = {}
    for mod in (
        relational,
        tpch_extra,
        parity,
        llm,
        udf_tier,
        lake,
        formats,
        corpus,
        curation,
        events,
        warehouse,
        sketch,
        graph,
        retrieval,
        imagedup,
    ):
        for p in mod.PROBES:
            if p.name in out:
                raise ValueError(f"duplicate probe name: {p.name}")
            out[p.name] = p
    return out
