"""Utilities: metrics logging, profiling hooks."""

from .metrics import MetricLogger

__all__ = ["MetricLogger"]
