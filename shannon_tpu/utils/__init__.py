"""Cross-cutting utilities: stage timing/observability and stage
checkpointing (reference: per-stage wall-clock log + files-as-checkpoints
resume — SURVEY.md §6)."""

from shannon_tpu.utils.timing import StageTimer  # noqa: F401
