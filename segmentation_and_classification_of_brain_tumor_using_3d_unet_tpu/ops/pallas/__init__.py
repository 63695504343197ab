"""Pallas TPU kernels for the framework's hot ops."""

from .groupnorm import fused_group_norm

__all__ = ["fused_group_norm"]
