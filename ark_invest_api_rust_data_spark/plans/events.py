"""Event-analytics probes (SURVEY.md §2 B12/B16 extensions): the
sequential funnel and retention-cohort queries over the events table —
see operators/events.py for the fold semantics and shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.events import funnel, retention_cohorts
from .base import Probe


def b12_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """B12 extension — view→click→purchase funnel: single-shuffle
    sorted-array fold on the Spark side vs the classic nested min-ts
    subquery formulation in the oracle; the hash compare proves the
    greedy fold computes exactly that."""
    return funnel(load_table(spark, sf, "events"))


B12_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')),
s1 AS (SELECT user_id, min(ts) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
SELECT u.user_id,
  CAST(CASE WHEN t3 IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1
            ELSE 0 END AS INTEGER) AS stage,
  t1, t2, t3
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


def b16_retention(spark: SparkSession, sf: str) -> DataFrame:
    """B16 extension — retention cohort matrix: first-activity date
    cohorts × day offsets, distinct active users per cell."""
    return retention_cohorts(load_table(spark, sf, "events"))


B16_RETENTION_SQL = """
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
c AS (SELECT user_id, min(d) AS cohort_d FROM d GROUP BY user_id)
SELECT cohort_d,
  CAST(date_diff('day', cohort_d, d.d) AS INTEGER) AS day_offset,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id)
GROUP BY cohort_d, day_offset
"""


PROBES = [
    Probe("b12_funnel", "B12", b12_funnel, B12_FUNNEL_SQL),
    Probe("b16_retention", "B16", b16_retention, B16_RETENTION_SQL),
]


def b12_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """B12 extension — per-user integer EWMA (α = 1/4) of the event
    value stream: one groupBy-user shuffle into a (ts, event_id)-sorted
    array, doc-local integer fold (floor division via the pmod
    identity, matching DuckDB's ``//``); the oracle replays the fold
    with list_reduce."""
    from ..operators.events import ewma

    return ewma(load_table(spark, sf, "events"))


B12_EWMA_SQL = """
WITH e AS (SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS v,
                  ts, event_id FROM events),
u AS (SELECT user_id, list(v ORDER BY ts, event_id) AS vs
      FROM e GROUP BY 1)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
       CAST(list_reduce(vs, (acc, x) -> (3 * acc + x) // 4) AS BIGINT)
         AS ewma
FROM u
"""


def b12_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """B12 extension — Markov transition counts of event-type bigrams
    per user sequence (the session-path mining primitive); one window
    shuffle, total (ts, event_id) sort."""
    from ..operators.events import transition_counts

    return transition_counts(load_table(spark, sf, "events"))


B12_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type AS prev_type, next_type, CAST(count(*) AS BIGINT) AS n
FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
"""

PROBES.extend(
    [
        Probe("b12_ewma", "B12", b12_ewma, B12_EWMA_SQL),
        Probe("b12_transitions", "B12", b12_transitions, B12_TRANSITIONS_SQL),
    ]
)
