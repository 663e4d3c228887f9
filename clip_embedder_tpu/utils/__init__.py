"""Host-side utilities: image IO, logging, timing."""

from .images import to_rgb_array

__all__ = ["to_rgb_array"]
