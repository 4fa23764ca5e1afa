"""Custom Pallas TPU kernels for hot ops."""

from .conv import fused_conv3x3, pack_weights

__all__ = ["fused_conv3x3", "pack_weights"]
