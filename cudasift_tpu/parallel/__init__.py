from .sharding import (
    make_mesh,
    extract_sift_batched,
    extract_sift_throughput_sharded,
    match_descriptors_sharded,
)

__all__ = [
    "make_mesh",
    "extract_sift_batched",
    "extract_sift_throughput_sharded",
    "match_descriptors_sharded",
]
