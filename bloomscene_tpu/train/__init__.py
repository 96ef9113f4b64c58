"""Training: losses, LR schedules, optimizer groups, the jitted step."""
