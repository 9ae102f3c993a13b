from .base import Sketch, SketchError, sketch_from_bytes
from .bloom import BloomFilter

__all__ = [
    "Sketch",
    "SketchError",
    "sketch_from_bytes",
    "BloomFilter",
]
