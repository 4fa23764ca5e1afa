"""Custom Pallas TPU kernels for hot ops, and their autotune selector."""

from .autotune import measure_conv_impls, resolve_conv_impl
from .conv import fused_conv3x3, pack_weights

__all__ = [
    "fused_conv3x3",
    "pack_weights",
    "measure_conv_impls",
    "resolve_conv_impl",
]
