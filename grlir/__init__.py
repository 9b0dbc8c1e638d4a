"""grlir — TPU-native image restoration framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ofsoundof/GRL-Image-Restoration (CVPR 2023 "GRL"): 7 restoration tasks
(denoise, classical SR, JPEG artifact removal, demosaicking, kernel deblur,
paired motion/defocus deblur, blind real-world SR), transformer models with
mixed window/anchored-stripe attention, training engines, metrics and
degradation physics.

Layout:
  grlir.ops       geometry precompute, layout transforms, Pallas kernels
  grlir.models    GRL network family + aux archs (flax.linen, NHWC)
  grlir.parallel  device mesh / sharding helpers (pjit, shard_map)
  grlir.data      datasets, manifests, degradation pipelines (host-side)
  grlir.engines   train/eval step functions (psnr + gan)
  grlir.losses    Charbonnier / perceptual / GAN losses
  grlir.metrics   PSNR / SSIM / PSNR-B / NIQE (pure functions)
  grlir.optim     LR schedules and optimizers (optax)
  grlir.utils     MATLAB-exact imaging utilities
"""

__version__ = "0.1.0"
