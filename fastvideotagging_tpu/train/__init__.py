"""Training: optimizer/schedule, train state, jitted step, checkpointing."""
