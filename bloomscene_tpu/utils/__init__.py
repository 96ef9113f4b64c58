"""Utilities: IO (PLY/checkpoints/video), depth visualization, metrics."""
