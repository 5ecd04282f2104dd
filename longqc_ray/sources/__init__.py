"""Readers/writers + per-partition lineage and resume."""
