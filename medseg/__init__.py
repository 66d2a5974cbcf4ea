"""medseg — a TPU-native 3D medical image segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
ilkyyldz95/3DmedicalImageSegmentation (UNETR supervised segmentation +
ranking-based self-supervised pretraining on top of MONAI 0.6), designed
TPU-first:

- NDHWC (channels-last) layouts everywhere — friendly to XLA:TPU tiling.
- Pure functional compute: jit-able train/eval steps over parameter pytrees,
  explicit PRNG keys, optax optimizers, orbax checkpoints.
- Sliding-window inference as a compiled `lax` loop over a static window grid
  (reference: MONAI ``sliding_window_inference`` called from
  ``unetr_segmentation_3d.py:109``), not a Python loop.
- Data parallelism via ``jax.sharding.Mesh`` + collectives over ICI
  (the reference is single-GPU; see SURVEY.md §2.3).
- Host/device split: NIfTI decode and dynamic-shape ops (foreground crop,
  pos/neg sampling) on host; everything static-shaped on device inside jit.
"""

__version__ = "0.1.0"
