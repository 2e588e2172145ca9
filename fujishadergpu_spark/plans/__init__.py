"""Planning-layer utilities: lineage/metrics checkpointing and
idempotent resume (SURVEY.md §7.2 M5)."""
