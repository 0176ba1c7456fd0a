"""Declared query surface: each Probe pairs a Spark DataFrame plan with an
ANSI-SQL DuckDB oracle (SURVEY.md §2 Part B + LLM ops + parity probes)."""

from .base import Probe, all_probes

__all__ = ["Probe", "all_probes"]
