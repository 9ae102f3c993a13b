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
