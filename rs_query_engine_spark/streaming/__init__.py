"""Structured Streaming operators (SURVEY §7 M2.6) — filled in as the
events-stream milestones land."""
