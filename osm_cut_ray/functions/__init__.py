"""Scalar/sketch helpers."""
from .hll import HyperLogLog  # noqa: F401
