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
from .relational import (
    bloom_semijoin,
    broadcast_lookup,
    broadcast_range_count,
    grouped_agg,
    grouped_quantiles,
    grouped_rollup,
    grouped_topk,
    hash_join,
    histogram_int,
    key_set_op,
    pivot_counts,
)
from .write import resumable_shard_map, write_partitioned

__all__ = [
    "build_sketch",
    "build_sketches",
    "build_grouped_sketches",
    "build_event_time_sketch",
    "grouped_to_dict",
    "merge_partials",
    "sketch_partials",
    "bloom_semijoin",
    "broadcast_lookup",
    "broadcast_range_count",
    "grouped_agg",
    "grouped_quantiles",
    "grouped_rollup",
    "grouped_topk",
    "hash_join",
    "histogram_int",
    "key_set_op",
    "pivot_counts",
    "membership",
    "sketch_probe",
    "resumable_shard_map",
    "write_partitioned",
]
