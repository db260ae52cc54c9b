"""TPU-native framework for stochastic image-to-video synthesis using cINNs.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
CompVis/image2video-synthesis-using-cINNs (CVPR 2021, arXiv:2105.04551):

  * Stage 1  — video VAE: 3D-ResNet dynamics encoder + SPADE/ADAIN-conditioned
               3D-conv video decoder, trained adversarially (temporal 3D + patch
               2D discriminators, LPIPS, KL).
  * Stage 2  — conditional INN: a 20-block conditional normalizing flow over the
               64-d dynamics latent, conditioned on a ResNet embedding of the
               start frame (optional endpoint control), exact NLL / sampling.
  * Metrics  — FVD / DTFVD / FID / LPIPS / diversity with on-TPU backbones.
  * Parallel — data-parallel training over a `jax.sharding.Mesh`, bf16 compute,
               fused Pallas kernels for the flow hot path.

Everything is channels-last (NDHWC / NHWC) and jit-compiled; no torch at
runtime (torch is only used by the optional checkpoint converter).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
