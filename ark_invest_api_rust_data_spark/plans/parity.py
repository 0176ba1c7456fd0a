"""Reference-parity probes (SURVEY.md §2 Part A) — filled in with
VALUES-based normalization probes once the normalizer lands."""

from __future__ import annotations

PROBES: list = []
