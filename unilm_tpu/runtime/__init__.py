"""L5 runtime: train/eval loops, generation engine, checkpointing, metrics."""
