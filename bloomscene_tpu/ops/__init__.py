"""Compute ops: projection, rasterization, KNN, hash grids, quantization."""
