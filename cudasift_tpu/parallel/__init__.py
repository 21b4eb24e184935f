from .sharding import (
    make_mesh,
    extract_sift_batched,
    match_descriptors_sharded,
)

__all__ = ["make_mesh", "extract_sift_batched", "match_descriptors_sharded"]
