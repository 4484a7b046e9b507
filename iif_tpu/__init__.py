"""iif_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for long-tailed
image recognition with Inverse Image Frequency (IIF).

A from-scratch rebuild of the capabilities of the reference repo
``kostas1515/iif`` (Alexandridis et al., IEEE TIP 2023): the long-tailed
classification trainer (CIFAR-LT / ImageNet-LT / Places-LT / iNat18) and the
mmdetection-based LVIS instance-segmentation stack (MaskRCNN / Cascade with
IIF & FASA+IIF heads) — re-designed TPU-first:

- functional flax models, optax optimizers, Orbax checkpoints;
- SPMD data parallelism over a ``jax.sharding.Mesh`` (ICI/DCN), no DDP;
- device-side fused augmentation inside the jitted train step;
- static-shape detection kernels (padded RoIs, fixed-iteration NMS,
  Pallas RoIAlign) instead of dynamic-shape CUDA ops.
"""

__version__ = "0.1.0"

from iif_tpu.registry import Registry, build_from_cfg  # noqa: F401
