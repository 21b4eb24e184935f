"""cudasift_tpu — a TPU-native SIFT framework built on JAX/XLA/Pallas.

From-scratch reimplementation of the capabilities of Celebrandil/CudaSift
(reference API: cudaSift.h:35-43), designed TPU-first: fused scale-space
stencils, mask-based deterministic compaction instead of atomics, MXU matmul
matching with a fused top-2 ratio test, and fully jitted RANSAC homography.

Public API parity map:

==========================  =====================================
CudaSift (cudaSift.h)       cudasift_tpu
==========================  =====================================
InitCuda                    (not needed — JAX owns the device)
AllocSiftTempMemory         (not needed — XLA allocates per program)
InitSiftData                init_sift_data
ExtractSift                 extract_sift
FreeSiftData                (garbage collected)
PrintSiftData               print_sift_data
MatchSiftData               match_sift_data
FindHomography              find_homography
ImproveHomography           improve_homography
==========================  =====================================
"""

def device_info(dev_num: int = 0) -> None:
    """Print the selected accelerator — the analogue of InitCuda's device
    banner (cudaSiftH.cu:19-37). Device selection itself belongs to JAX."""
    import jax

    devices = jax.devices()
    dev = devices[min(dev_num, len(devices) - 1)]
    print(f"Device Number: {dev.id}")
    print(f"  Device name: {dev.device_kind}")
    print(f"  Platform: {dev.platform}")
    print(f"  Total devices: {len(devices)}")


from .config import SiftParams, MatchParams, HomographyParams
from .sift_data import (SiftData, init_sift_data, print_sift_data,
                        ref_style_num_pts)
from .pipeline import extract_sift, extract_sift_throughput
from .ops.match import match_sift_data, match_descriptors
from .ops.homography import find_homography, improve_homography

__all__ = [
    "device_info",
    "SiftParams",
    "MatchParams",
    "HomographyParams",
    "SiftData",
    "init_sift_data",
    "print_sift_data",
    "ref_style_num_pts",
    "extract_sift",
    "extract_sift_throughput",
    "match_sift_data",
    "match_descriptors",
    "find_homography",
    "improve_homography",
]

__version__ = "0.1.0"
