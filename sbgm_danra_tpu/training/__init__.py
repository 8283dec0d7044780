"""Training engine: train state, steps, schedulers, checkpoints, pipeline."""
