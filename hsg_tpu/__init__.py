"""hsg_tpu: TPU-native framework for unsupervised hierarchical semantic
segmentation (HSG, CVPR 2022) built on JAX / Flax / optax / Pallas.

Re-designed TPU-first from the capabilities of the PyTorch reference
(twke18/HSG): one SPMD program over a `data` mesh, fixed-shape padded
segment state, jitted spherical k-means EM, and fused contrastive kernels.
"""

__version__ = "0.1.0"
