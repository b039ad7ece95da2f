"""afcm_tpu — a TPU-native (JAX/XLA/Pallas) framework for alias-free co-modulated
GANs for cross-modality synthesis and super-resolution of MR images.

This is a from-scratch re-design of the capabilities of zhiyuns/AFCM
(MICCAI 2023) for TPU hardware:

* the custom CUDA ops (`upfirdn2d`, `bias_act`, `filtered_lrelu`) become fused
  XLA convolutions and Pallas kernels (`afcm_tpu.ops`),
* the alias-free generator / co-modulated networks become functional
  flax modules compiled into a single XLA graph (`afcm_tpu.nn`),
* GAN training (softplus losses, R1 penalty, EMA, blur fade) is one jitted
  train step with `jax.grad`-based double differentiation
  (`afcm_tpu.models`),
* data-parallel scaling rides `jax.sharding.Mesh` + ICI collectives
  (`afcm_tpu.parallel`),
* the h5 volume pipeline / patch-stitched predictor live host-side with
  device-side stitching (`afcm_tpu.data`, `afcm_tpu.infer`).
"""

__version__ = "0.1.0"
