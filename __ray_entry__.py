"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` happens here or in the library code these
callables use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: ONE Ray Data scan of
    ``documents`` builds Bloom + HLL + CMS + t-digest + KLL partials,
    tree-merged into finalized sketches; returns a summary table
    (one row per sketch with its headline estimate)."""
    import pyarrow as pa
    import ray.data as rd

    from archbloom_ray.sketches import (
        BloomFilter,
        CountMinSketch,
        HyperLogLog,
        KLLSketch,
        TDigest,
    )
    from archbloom_ray.pipelines.build import build_sketches

    sf_dir = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source", "n_chars"])
    n = ds.count()
    sketches = build_sketches(ds, {
        "bloom_text": ("text", lambda: BloomFilter(max(n, 10), 0.01)),
        "hll_text": ("text", lambda: HyperLogLog(14)),
        "cms_source": ("source", lambda: CountMinSketch(epsilon=0.001, delta=0.01)),
        "tdigest_chars": ("n_chars", lambda: TDigest(200)),
        "kll_chars": ("n_chars", lambda: KLLSketch(200)),
    })
    rows = []
    for sid, sk in sorted(sketches.items()):
        if isinstance(sk, HyperLogLog):
            estimate = sk.cardinality()
        elif isinstance(sk, (TDigest, KLLSketch)):
            estimate = sk.quantile(0.5)
        elif isinstance(sk, CountMinSketch):
            estimate = float(sk.total)
        else:
            estimate = float(sk.saturation_count())
        rows.append({"sketch_id": sid, "estimate": float(estimate),
                     "state_bytes": len(sk.to_bytes())})
    # contract: entry() returns a Dataset or pandas DataFrame
    return pa.table({
        "sketch_id": pa.array([r["sketch_id"] for r in rows], type=pa.string()),
        "estimate": pa.array([r["estimate"] for r in rows], type=pa.float64()),
        "state_bytes": pa.array([r["state_bytes"] for r in rows], type=pa.int64()),
    }).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from archbloom_ray.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from archbloom_ray.queries import oracle_sql as _oracle

    return _oracle()
