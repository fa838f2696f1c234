"""Execution plans: salting, lineage/resume, metrics."""
