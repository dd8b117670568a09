"""GSVC-TPU: a TPU-native entropy-constrained 3D-Gaussian video codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GSVC
reference (fitting-based video compression with Scaffold-GS style anchored
3D gaussians, a Toast-like Sliding Window orthographic renderer, learned
hash-grid-conditioned entropy models and host-side rANS/octree coders).

Design center (TPU-first, not a port):
  * One fused XLA program per training step: 4 renders + loss + backward +
    Adam under a single ``jax.jit``.
  * Static shapes everywhere: anchors live in a padded capacity buffer,
    kept z-sorted so the TSW visibility window is a ``dynamic_slice``
    instead of a boolean gather.
  * Compositing is reformulated associatively (exclusive cum-product of
    transmittance) so splatting maps onto MXU matmuls and Pallas tiles.
  * Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` (data
    parallel over frame pairs; z-slab anchor sharding for model parallel).
  * Bits are *estimated* on device; streams are *packed* on host by a C++
    rANS/octree codec (the TPU analog of the reference's CUDA/tmc3 split).
"""

__version__ = "0.1.0"
