"""Native (C++) input-pipeline components, bound via ctypes.

`get_native_loader()` compiles/loads libmldloader.so on demand; returns None
when no toolchain is available, and callers fall back to the numpy path.
"""
from .batch_loader import NativeBatchLoader, get_native_loader

__all__ = ["NativeBatchLoader", "get_native_loader"]
