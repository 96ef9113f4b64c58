"""BloomScene-TPU: a TPU-native crossmodal 3D scene generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SparklingH/BloomScene (AAAI 2025): progressive text+image -> 360 degree scene
generation, structured (Scaffold-GS style) anchor-based 3D Gaussian splatting
with a depth-differentiable rasterizer, hierarchical depth-prior
regularization, and HAC-style structured context compression with entropy
coding.

Layers (mirrors the reference layer map, SURVEY.md section 1, rebuilt
TPU-first):

- ``bloomscene_tpu.ops``      pure-JAX + Pallas compute ops (projection, EWA,
                              tile binning, differentiable rasterization with
                              RGB *and* depth gradients, KNN, hash grids,
                              quantizers, entropy models).
- ``bloomscene_tpu.models``   the anchor-based Gaussian model (state pytrees,
                              MLP heads, neural decode, densification).
- ``bloomscene_tpu.parallel`` device-mesh sharding of tiles/splats/params.
- ``bloomscene_tpu.scene``    cameras, trajectories, dataset assembly.
- ``bloomscene_tpu.train``    losses, LR schedules, the jitted train step.
- ``bloomscene_tpu.codec``    host-side rANS entropy coder + scene codec.
- ``bloomscene_tpu.priors``   pluggable diffusion-inpaint / monocular-depth
                              priors (stub fixtures for CI; real models opt-in).
- ``bloomscene_tpu.pipeline`` the end-to-end BloomScene orchestrator.
"""

__version__ = "0.1.0"
