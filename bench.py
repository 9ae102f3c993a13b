#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Plain run:   times the headline pipelines over $GRAFT_SF_DIR (default
             /root/testdata/sf0.1) at $RAY_GRAFT_CPUS CPUs (default 32)
             and prints ONE JSON line:
             {"metric", "value", "unit": "sec", "queries", "sf", "num_cpus", ...}
--scaling:   runs the SAME job twice in fresh processes at 8 and 32
             CPUs on the same input and reports both throughputs plus
             scaling efficiency = (T8/T32)/4 (sandbox substitute for
             the N vs 4N cluster criterion — BASELINE.md).

The headline is the north-rule pipeline: one-scan multi-sketch build
(Bloom + HLL + CMS + t-digest + KLL) over the Common-Crawl-style pages
corpus, plus the heavy supporting pipelines over the sf tables.  The
pages corpus is generated deterministically once and cached under /tmp
(FIXTURES.md sf-bench tier), so both scaling runs see identical input.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# sf-bench pages tier: sized so the 8-CPU headline build stays compute-
# bound (≥ ~20 s) — the scaling criterion is meaningless on a run
# dominated by fixed per-stage latency
BENCH_PAGES_ROWS = int(os.environ.get("GRAFT_BENCH_PAGES_ROWS", "8000000"))
SCALING_REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))


def _timed(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def run_bench() -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if not ray.is_initialized():
        # glibc tunables for every Ray worker: keep large numpy buffers on
        # the reusable heap instead of fresh mmaps — first-touch page
        # faults are pathologically slow in this sandbox (~30 MB/s), and
        # per-task fresh mappings would tax every batch
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR",
                 runtime_env={"env_vars": {
                     "MALLOC_MMAP_THRESHOLD_": "268435456",
                     "MALLOC_TRIM_THRESHOLD_": "268435456",
                 }})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from archbloom_ray.datagen import pages_fixture
    from archbloom_ray.sketches import (BloomFilter, CountMinSketch, HyperLogLog,
                                        KLLSketch, TDigest)
    from archbloom_ray.pipelines.build import build_sketches, build_grouped_sketches, grouped_to_dict
    from archbloom_ray.stages import minhash_lsh_pairs, add_quality, add_fingerprint

    pages_path = pages_fixture(BENCH_PAGES_ROWS, seed=42)
    # warm the page cache so both scaling levels measure compute, not first-read
    for name in sorted(os.listdir(pages_path)):
        with open(os.path.join(pages_path, name), "rb") as f:
            while f.read(1 << 24):
                pass

    n_pages = BENCH_PAGES_ROWS
    # Warm the worker pool (untimed).  The headline metric is
    # steady-state docs/sec (BASELINE.md protocol): at 10^12-row scale
    # one-time worker start is noise, but this sandbox faults fresh mmap
    # pages at ~30 MB/s, so a cold worker's first big numpy allocations
    # would otherwise dominate a short run.  Touch ~128 MB of allocator
    # arena in EVERY worker (4+ tasks per CPU so each process gets one).
    def touch(batch):
        scratch = np.empty(16_000_000, dtype=np.uint64)  # 128 MB
        scratch.fill(1)
        return {"n": np.array([len(batch["id"])], dtype=np.int64)}

    rd.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 8).map_batches(
        touch, batch_format="numpy", batch_size=None).take_all()

    timings: dict[str, float] = {}

    def headline_build():
        ds = rd.read_parquet(pages_path, columns=["url", "text", "lang"])

        def lens(batch: pa.Table) -> pa.Table:
            return batch.append_column("n_chars", pc.utf8_length(batch["text"]))

        ds = ds.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)
        build_sketches(ds, {
            "bloom_url": ("url", lambda: BloomFilter(n_pages, 0.01)),
            "hll_url": ("url", lambda: HyperLogLog(14)),
            "cms_lang": ("lang", lambda: CountMinSketch(epsilon=0.0005, delta=0.01)),
            "tdigest_chars": ("n_chars", lambda: TDigest(200)),
            "kll_chars": ("n_chars", lambda: KLLSketch(200)),
            # batch sized so Bloom partial-state traffic stays ~30 states
            # (O(m) each) while tasks still cover every CPU
        }, batch_size=262144)

    timings["pages_sketch_build"] = _timed(headline_build)

    def grouped_build():
        def dom(batch: pa.Table) -> pa.Table:
            doms = pc.list_element(pc.split_pattern(batch["url"], "/"), 2)
            return pa.table({"lang": batch["lang"], "domain": doms})

        ds = rd.read_parquet(pages_path, columns=["url", "lang"]).map_batches(
            dom, batch_format="pyarrow", zero_copy_batch=True
        )
        grouped_to_dict(build_grouped_sketches(
            ds, "lang", "domain", lambda: CountMinSketch(epsilon=0.001, delta=0.01),
            salt=8, batch_size=65536,
        ))

    timings["pages_grouped_cms"] = _timed(grouped_build)

    def quality_fingerprint():
        ds = rd.read_parquet(pages_path, columns=["url", "text"])
        ds = add_quality(ds)
        ds = add_fingerprint(ds)
        # consume: aggregate quality stats (no driver materialization)
        ds.select_columns(["quality_score"]).map_batches(
            lambda b: pa.table({"s": pa.array([float(pc.sum(b["quality_score"]).as_py() or 0.0)]),
                                "n": pa.array([len(b)], type=pa.int64())}),
            batch_format="pyarrow",
        ).take_all()

    timings["pages_quality_fingerprint"] = _timed(quality_fingerprint)

    def minhash_dedup():
        rows = min(100_000, BENCH_PAGES_ROWS)
        sub = pages_fixture(rows, seed=9)
        ds = rd.read_parquet(sub, columns=["url", "text"])
        minhash_lsh_pairs(ds, "text", "url", num_perm=64, bands=16,
                          threshold=0.7, concurrency=max(2, NUM_CPUS - 2)).count()

    timings["pages_minhash_dedup_100k"] = _timed(minhash_dedup)

    def sfdir_suite():
        from archbloom_ray import queries as Q

        for name in ("lineitem_pricing", "events_hourly", "top_users",
                     "dedup_exact", "orders_by_segment"):
            res = Q.queries()[name](SF_DIR)
            if hasattr(res, "take_all"):
                res.take_all()

    timings["sfdir_exact_suite"] = _timed(sfdir_suite)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_pages / timings["pages_sketch_build"], 1)
    return {
        "metric": "headline_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages_rows": n_pages,
        "sketch_build_docs_per_sec": docs_per_sec,
    }


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs."""
    # pre-generate the shared corpus so neither run pays generation
    from archbloom_ray.datagen import pages_fixture

    pages_fixture(BENCH_PAGES_ROWS, seed=42)
    pages_fixture(min(100_000, BENCH_PAGES_ROWS), seed=9)

    def run(ncpu: int) -> dict:
        best = None
        for _ in range(SCALING_REPEATS):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    lo, hi = run(8), run(32)
    # Efficiency on the metric BASELINE.json names: sketch-build
    # throughput (docs/sec).  Total suite seconds are reported alongside.
    r_lo = lo["sketch_build_docs_per_sec"]
    r_hi = hi["sketch_build_docs_per_sec"]
    eff = (r_hi / r_lo) / (32 / 8)
    result = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "throughput_8cpu_docs_per_sec": r_lo,
        "throughput_32cpu_docs_per_sec": r_hi,
        "sec_8cpu_total": lo["value"],
        "sec_32cpu_total": hi["value"],
        "queries_8cpu": lo["queries"],
        "queries_32cpu": hi["queries"],
        "pages_rows": BENCH_PAGES_ROWS,
    }
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        import ray

        out = run_bench()
        ray.shutdown()
        print(json.dumps(out))
