"""Pipeline plans: stage orchestration, lineage, checkpoint/resume."""
