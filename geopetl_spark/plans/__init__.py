from .barriers import opaque

__all__ = ["opaque"]
