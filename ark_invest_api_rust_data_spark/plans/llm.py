"""LLM-data-pipeline probes (SURVEY.md §2 B25–B32) — filled in with
dedup / similarity / text-analysis probes as the operators land."""

from __future__ import annotations

PROBES: list = []
