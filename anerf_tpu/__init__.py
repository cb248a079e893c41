"""anerf_tpu: a TPU-native articulated neural radiance field framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of A-NeRF
(Su et al., NeurIPS 2021): skeleton-relative neural radiance fields for human
shape/appearance/pose learning from video with noisy pose estimates.
"""

__version__ = '0.1.0'
