from .build import (
    build_sketch,
    build_sketches,
    build_grouped_sketches,
    grouped_to_dict,
    merge_partials,
    sketch_partials,
)
from .query import membership, sketch_probe

__all__ = [
    "build_sketch",
    "build_sketches",
    "build_grouped_sketches",
    "grouped_to_dict",
    "merge_partials",
    "sketch_partials",
    "membership",
    "sketch_probe",
]
