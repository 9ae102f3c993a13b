from .build import (
    build_sketch,
    build_sketches,
    build_grouped_sketches,
    build_event_time_sketch,
    grouped_to_dict,
    merge_partials,
    sketch_partials,
)
from .query import membership, sketch_probe
from .write import resumable_shard_map, write_partitioned

__all__ = [
    "build_sketch",
    "build_sketches",
    "build_grouped_sketches",
    "build_event_time_sketch",
    "grouped_to_dict",
    "merge_partials",
    "sketch_partials",
    "membership",
    "sketch_probe",
    "resumable_shard_map",
    "write_partitioned",
]
