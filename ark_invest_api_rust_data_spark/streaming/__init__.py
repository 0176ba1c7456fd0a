"""Structured Streaming surface over the events table (SURVEY.md §2
B21–B24): tumbling/sliding/session windows, watermarked late data,
stateful dedupe — each with a batch twin proven equivalent by replay
tests."""
