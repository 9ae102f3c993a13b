"""archbloom_ray — a Ray-Data-native mergeable-sketch / approximate
aggregation engine.

Brand-new engine with the query capabilities of the reference C sketch
library (droberson/archbloom, surveyed in SURVEY.md) re-expressed as
mergeable UDAFs driven by ``ray.data.Dataset`` pipelines, plus the
scale-out additions (HyperLogLog, count-min sketch, t-digest, KLL) and
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Drop Ray Data's benign per-task "Failed to hash the schemas (for
    deduplication)" warning: parquet written by pandas carries a
    ``b'pandas'`` schema-metadata dict that makes ``pa.Schema``
    unhashable, so Ray's schema-dedup fast path logs this on every
    multi-block batch — pure noise that buries real warnings in bench
    and job logs.  The filter installs wherever this package is
    imported, which includes every Ray worker running our UDFs."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoiseFilter())
