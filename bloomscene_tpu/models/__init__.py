"""Anchor-based (Scaffold-GS style) Gaussian model with HAC compression."""
