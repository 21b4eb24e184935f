"""Pallas TPU kernels for the hot SIFT stages.

Each kernel has a pure-XLA twin in ``cudasift_tpu.ops`` used on non-TPU
platforms and as the correctness oracle in tests (interpret mode).
"""

from .descriptor import extract_descriptors_pallas
from .orient import orientation_histograms_pallas

__all__ = ["extract_descriptors_pallas", "orientation_histograms_pallas"]
