"""Pallas TPU kernels for the hot rasterization path."""
