"""Structured Streaming surface (SURVEY.md §2.9, §7 M4).

The reference is strictly batch (orchestrated re-runs via Step
Functions are its only recurrence). Streaming here reuses the *same*
aggregation expression trees as the batch operators in
``operators.events_time`` — batch oracle checks vouch for the shared
semantics; streaming adds watermarks, triggers, and sinks.
"""
