from medseg.kernels.conv3d import (
    conv3x3x3,
    conv3x3x3_flat,
    flat_supported,
    to_flat,
    from_flat,
    weight_matrix,
)

__all__ = [
    "conv3x3x3",
    "conv3x3x3_flat",
    "flat_supported",
    "to_flat",
    "from_flat",
    "weight_matrix",
]
