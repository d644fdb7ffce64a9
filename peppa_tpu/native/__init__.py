"""Native (C++) runtime: packed-cache reader + threaded batch prefetch loader."""

from peppa_tpu.native.loader import NativeBatchLoader, NativePack, native_available

__all__ = ["NativeBatchLoader", "NativePack", "native_available"]
