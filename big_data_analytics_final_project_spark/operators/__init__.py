"""Composite dataflow operators.

Each module composes built-in DataFrame operations into an operator the
reference expressed imperatively (pair mining, sessionization) or that
a 100 TB training-data pipeline needs (dedup family, similarity search,
multimodal plumbing). No Catalyst extensions required — SURVEY.md §4.
"""
