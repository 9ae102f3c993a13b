#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Plain run:   times the headline pipelines over $GRAFT_SF_DIR (default
             /root/testdata/sf0.1) at $RAY_GRAFT_CPUS CPUs (default 32)
             and prints ONE JSON line:
             {"metric", "value", "unit": "sec", "queries", "sf", "num_cpus", ...}
--scaling:   runs the SAME jobs in fresh processes at $GRAFT_SCALING_LO
             (default 8) and $GRAFT_SCALING_HI (default 32) CPUs on the
             same inputs, median over $GRAFT_SCALING_REPEATS runs, and
             reports throughput at both plus scaling efficiency =
             (R_hi/R_lo)/(hi/lo) — the sandbox substitute for the
             N vs 4N cluster criterion (protocol + caveats: BASELINE.md).
             Criterion pipeline = compute-bound MinHash dedup; the
             bandwidth-bound sketch build is reported alongside.

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
SCALING_REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
# Bandwidth-aware task sizing: this host advertises 32 CPUs but sustains
# ~16 concurrent heavy tasks (pure-CPU scaling is linear to 16, collapses
# at 32; see BASELINE.md).  Giving bandwidth-heavy tasks num_cpus=2 caps
# concurrency at NUM_CPUS/2 without changing semantics.
TASK_CPUS = float(os.environ.get("GRAFT_TASK_CPUS", "2" if NUM_CPUS >= 16 else "1"))


def _worker_pythonpath() -> str:
    """Repo root (+ inherited PYTHONPATH) for Ray workers: the logging
    setup hook is pickled by reference and must import archbloom_ray."""
    root = os.path.dirname(os.path.abspath(__file__))
    inherited = os.environ.get("PYTHONPATH")
    return root + (":" + inherited if inherited else "")


def _timed(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def host_speed_probe() -> dict:
    """~1 s single-core probe of the two axes every pipeline here is
    bound by (DRAM stream bandwidth, hash compute).  Recorded with each
    bench run because this host's co-tenant interference swings
    measured throughput by >±75% (CLAUDE.md §quirks; recorded healthy
    values ≈ 4 GB/s and ≈ 1e6 rows/s) — a bench number is only
    interpretable next to the host speed it was measured at."""
    import numpy as np
    import pyarrow as pa

    from archbloom_ray.hashing import mmh3_128_batch

    b = np.random.default_rng(0).random(20_000_000)
    c = np.empty_like(b)          # preallocate + touch: measure the DRAM
    c[:] = 0.0                    # stream, not the mmap first-touch tax
    t0 = time.monotonic()
    for _ in range(3):
        np.multiply(b, 1.5, out=c)
    dram_gbps = 3 * b.nbytes * 2 / (time.monotonic() - t0) / 1e9
    texts = pa.array(["x" * 200 + str(i) for i in range(20_000)])
    mmh3_128_batch(texts)        # warm: amortize the one-time fault cost
    t0 = time.monotonic()
    mmh3_128_batch(texts)
    mmh3_krows = 20_000 / (time.monotonic() - t0) / 1e3
    # the fault tax itself: first touch of a fresh anonymous mapping
    # (documented healthy ≈ 30 MB/s; co-tenant pressure can push it to
    # ~1 MB/s, which is what turns a 50 s bench into a 200 s one)
    fresh = np.empty(32_000_000, dtype=np.uint8)
    t0 = time.monotonic()
    fresh[::4096] = 1
    fault_mbps = fresh.nbytes / (time.monotonic() - t0) / 1e6
    return {"host_dram_gbps": round(dram_gbps, 2),
            "host_mmh3_krows_per_sec": round(mmh3_krows, 1),
            "host_fault_mbps": round(fault_mbps, 1)}


def run_bench() -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from archbloom_ray.proc_cache import ray_data_logging_config_path

    if not ray.is_initialized():
        # glibc tunables for every Ray worker: keep large numpy buffers on
        # the reusable heap instead of fresh mmaps — first-touch page
        # faults are pathologically slow in this sandbox (~30 MB/s), and
        # per-task fresh mappings would tax every batch.  The logging
        # config pins ray.data's noisy schema-hash warning at ERROR in
        # driver and workers alike.
        env_vars = {
            "MALLOC_MMAP_THRESHOLD_": "268435456",
            "MALLOC_TRIM_THRESHOLD_": "268435456",
            "PYTHONPATH": _worker_pythonpath(),
        }
        log_cfg = ray_data_logging_config_path()
        if log_cfg:
            os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", log_cfg)
            env_vars["RAY_DATA_LOGGING_CONFIG"] = log_cfg
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR",
                 runtime_env={"env_vars": env_vars})
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

        extra = {"num_cpus": TASK_CPUS} if TASK_CPUS != 1 else {}
        ds = ds.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True, **extra)
        build_sketches(ds, {
            "bloom_url": ("url", lambda: BloomFilter(n_pages, 0.01)),
            "hll_url": ("url", lambda: HyperLogLog(14)),
            "cms_lang": ("lang", lambda: CountMinSketch(epsilon=0.0005, delta=0.01)),
            "tdigest_chars": ("n_chars", lambda: TDigest(200)),
            "kll_chars": ("n_chars", lambda: KLLSketch(200)),
            # batch scales with rows so Bloom partial-state traffic
            # stays ~30 states (O(m) each) while tasks still cover
            # every CPU — a FIXED batch makes the combine traffic
            # quadratic in rows (see _headline_build_once)
        }, batch_size=max(262144, n_pages // 32),
           num_cpus=TASK_CPUS if TASK_CPUS != 1 else None)

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
        tc = TASK_CPUS if TASK_CPUS != 1 else None
        ds = rd.read_parquet(pages_path, columns=["url", "text"])
        # 16k batches keep the flat-token working set cache-resident
        # (measured 185 vs 139 krows/s against whole-block batches)
        ds = add_quality(ds, num_cpus=tc, batch_size=16384)
        ds = add_fingerprint(ds, num_cpus=tc, batch_size=16384)
        # consume: aggregate quality stats (no driver materialization)
        ds.select_columns(["quality_score"]).map_batches(
            lambda b: pa.table({"s": pa.array([float(pc.sum(b["quality_score"]).as_py() or 0.0)]),
                                "n": pa.array([len(b)], type=pa.int64())}),
            batch_format="pyarrow",
        ).take_all()

    timings["pages_quality_fingerprint"] = _timed(quality_fingerprint)

    def tdbloom_event_time():
        """North-star time-decay family at bench scale, built on the
        SHARDED slot-max path (build_sharded_tdbloom_states): shuffle
        moves pre-aggregated (shard, pos, tick) rows — independent of
        the m×slot_width state size that made per-batch tdbloom
        partials untenable (153 MB each at this m)."""
        from archbloom_ray.pipelines import build_sharded_tdbloom_states
        from archbloom_ray.sketches import TimeDecayingBloomFilter

        from archbloom_ray.sources import parquet_column_bounds

        meta_bounds = parquet_column_bounds(pages_path, "warc_ts")
        if meta_bounds is not None:
            # footer statistics only — no data pages read for the bounds
            lo, hi = (pa.scalar(b, pa.timestamp("us"))
                      .cast(pa.int64()).as_py() // 1_000_000
                      for b in meta_bounds)
        else:  # stats-less files: fall back to the narrow scan
            def ts_bounds(batch: pa.Table) -> pa.Table:
                s = pc.divide(pc.cast(batch["warc_ts"], pa.int64()),
                              pa.scalar(1_000_000, pa.int64()))
                return pa.table({"lo": pa.array([pc.min(s).as_py()], type=pa.int64()),
                                 "hi": pa.array([pc.max(s).as_py()], type=pa.int64())})

            bounds = rd.read_parquet(pages_path, columns=["warc_ts"]).map_batches(
                ts_bounds, batch_format="pyarrow", zero_copy_batch=True).take_all()
            lo = min(r["lo"] for r in bounds)
            hi = max(r["hi"] for r in bounds)
        span = max(hi - lo, 4)
        unit = max(1, span // 4000)  # coarsen so ticks fit 2-byte slots
        timeout_u = max((span // unit) // 4, 255)

        def to_units(batch: pa.Table) -> pa.Table:
            s = pc.divide(pc.cast(batch["warc_ts"], pa.int64()),
                          pa.scalar(1_000_000, pa.int64()))
            u = pc.divide(pc.subtract(s, pa.scalar(lo, pa.int64())),
                          pa.scalar(unit, pa.int64()))
            return pa.table({"url": batch["url"], "secs": u})

        extra = {"num_cpus": TASK_CPUS} if TASK_CPUS != 1 else {}
        ds = rd.read_parquet(pages_path, columns=["url", "warc_ts"]).map_batches(
            to_units, batch_format="pyarrow", zero_copy_batch=True, **extra)
        build_sharded_tdbloom_states(
            ds, "url", "secs",
            lambda: TimeDecayingBloomFilter(n_pages, 0.01, timeout=timeout_u,
                                            start_time=0),
            num_shards=max(16, NUM_CPUS), batch_size=262144)

    timings["pages_tdbloom_event_time"] = _timed(tdbloom_event_time)

    def sharded_qf():
        """Deletable-AMQ family at bench scale: fingerprint-range
        sharded quotient-filter build over the url column — the scan
        ships one deduped uint64 fingerprint per key (8 B, independent
        of capacity), reducers union disjoint sorted ranges."""
        from archbloom_ray.pipelines import build_sharded_qf_states
        from archbloom_ray.sketches import QuotientFilter

        ds = rd.read_parquet(pages_path, columns=["url"])
        build_sharded_qf_states(
            ds, "url", lambda: QuotientFilter(n_pages, 0.01),
            num_shards=max(16, NUM_CPUS), batch_size=262144,
            num_cpus=TASK_CPUS if TASK_CPUS != 1 else None)

    timings["pages_sharded_qf"] = _timed(sharded_qf)

    def minhash_dedup():
        rows = min(100_000, BENCH_PAGES_ROWS)
        sub = pages_fixture(rows, seed=9)
        ds = rd.read_parquet(sub, columns=["url", "text"])
        minhash_lsh_pairs(ds, "text", "url", num_perm=64, bands=16,
                          threshold=0.7, concurrency=max(2, NUM_CPUS - 2),
                          num_cpus=TASK_CPUS if TASK_CPUS != 1 else None).count()

    timings["pages_minhash_dedup_100k"] = _timed(minhash_dedup)

    def dup_span():
        from archbloom_ray.hashing import mmh3_64_batch
        from archbloom_ray.stages.cleaning import duplicate_spans

        rows = min(200_000, BENCH_PAGES_ROWS)
        sub = pages_fixture(rows, seed=9)

        def add_id(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pa.array(mmh3_64_batch(b["url"]).view(np.int64)),
                "text": b["text"],
            })

        ds = rd.read_parquet(sub, columns=["url", "text"]).map_batches(
            add_id, batch_format="pyarrow", zero_copy_batch=True)
        duplicate_spans(ds, "text", "doc_id", n=5).count()

    timings["pages_dup_span_200k"] = _timed(dup_span)

    def curation_funnel():
        """Streaming curation funnel (VERDICT r4 item 9): quality gate
        → exact dedup → deterministic 1% survivor sample as ONE lazy
        chain with a single consume — no .materialize()/take_all
        between stages, so backpressure pipelines the whole funnel.
        The gate-only leg is timed separately (funnel_parts below) to
        show composition adds pipeline stages, not materializations."""
        from archbloom_ray.hashing import fmix64_batch, mmh3_64_batch
        from archbloom_ray.pipelines import grouped_agg
        from archbloom_ray.stages.text import quality_features_arrow

        rows = min(2_000_000, BENCH_PAGES_ROWS)
        sub = pages_fixture(rows, seed=9)
        extra = {"num_cpus": TASK_CPUS} if TASK_CPUS != 1 else {}

        def gate(b: pa.Table) -> pa.Table:
            f = quality_features_arrow(b["text"])
            ok = ((f["n_words"] >= 10)
                  & (f["n_punct"] * 5 <= f["n_chars"]))
            t = b.filter(pa.array(ok))
            h = mmh3_64_batch(t["text"].combine_chunks()).view(np.int64)
            return pa.table({"lang": t["lang"], "h": pa.array(h),
                             "url": t["url"]})

        def gated():
            return rd.read_parquet(
                sub, columns=["url", "text", "lang"]).map_batches(
                gate, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=16384, **extra)

        t0 = time.monotonic()
        gated().count()
        gate_sec = time.monotonic() - t0

        def sample(b: pa.Table) -> pa.Table:
            keep = (fmix64_batch(np.asarray(b["h"]).view(np.uint64))
                    % np.uint64(100)) == 0
            return b.filter(pa.array(keep))

        t0 = time.monotonic()
        uniq = grouped_agg(gated(), ["lang", "h"], [("url", "url", "min")])
        n = uniq.map_batches(sample, batch_format="pyarrow",
                             zero_copy_batch=True).count()
        funnel_sec = time.monotonic() - t0
        return {"funnel_sec": round(funnel_sec, 2),
                "gate_only_sec": round(gate_sec, 2),
                "rows": rows, "sampled": int(n)}

    funnel_parts = curation_funnel()
    timings["pages_curation_funnel_2m"] = funnel_parts["funnel_sec"]

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
        "funnel_parts": funnel_parts,
        **host_speed_probe(),
    }


SCALING_LO = int(os.environ.get("GRAFT_SCALING_LO", "8"))
SCALING_HI = int(os.environ.get("GRAFT_SCALING_HI", "32"))
SCALING_MINHASH_ROWS = int(os.environ.get("GRAFT_SCALING_MINHASH_ROWS", "400000"))


def _child_ray_init(ncpu: int, object_store_memory: int | None = None):
    """Fresh-process Ray session with the sandbox glibc tunables + a
    warmed worker pool; returns the ray.data module.
    ``object_store_memory`` caps the plasma store (bytes) — the
    capped-store certification leg."""
    import numpy as np
    import ray

    from archbloom_ray.proc_cache import ray_data_logging_config_path

    env_vars = {
        "MALLOC_MMAP_THRESHOLD_": "268435456",
        "MALLOC_TRIM_THRESHOLD_": "268435456",
        "PYTHONPATH": _worker_pythonpath(),
    }
    log_cfg = ray_data_logging_config_path()
    if log_cfg:
        os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", log_cfg)
        env_vars["RAY_DATA_LOGGING_CONFIG"] = log_cfg
    extra = ({"object_store_memory": int(object_store_memory)}
             if object_store_memory else {})
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": env_vars}, **extra)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    def touch(batch):
        s = np.empty(16_000_000, dtype=np.uint64)
        s.fill(1)
        return {"n": np.array([len(batch["id"])], dtype=np.int64)}

    rd.range(ncpu * 8, override_num_blocks=ncpu * 8).map_batches(
        touch, batch_format="numpy", batch_size=None).take_all()
    return rd


def _headline_build_once(rd, rows: int) -> float:
    """The headline one-scan 5-sketch build over the `rows`-sized pages
    fixture; returns wall seconds.

    batch_size scales with rows (≤ ~32 partials): the monolithic
    path's groupby-combine traffic is n_batches × state_bytes, and the
    Bloom state is O(rows) — a FIXED batch size makes that traffic
    quadratic in rows (measured: 123 × 38 MB of Bloom partials at 32 M
    rows flooded 13-17 GB through the two Sort stages and an 8 GiB
    object store spilled; 31 partials → zero spill).  Beyond what one
    machine's store absorbs, `plan_filter_build` routes the Bloom to
    the sharded builder whose traffic is independent of m."""
    import pyarrow.compute as pc

    from archbloom_ray.datagen import pages_fixture
    from archbloom_ray.sketches import (BloomFilter, CountMinSketch, HyperLogLog,
                                        KLLSketch, TDigest)
    from archbloom_ray.pipelines.build import build_sketches

    pages = pages_fixture(rows, seed=42)
    batch = max(262144, rows // 32)
    t0 = time.monotonic()
    build_sketches(
        rd.read_parquet(pages, columns=["url", "text", "lang"]).map_batches(
            lambda b: b.append_column("n_chars", pc.utf8_length(b["text"])),
            batch_format="pyarrow", zero_copy_batch=True),
        {
            "bloom_url": ("url", lambda: BloomFilter(rows, 0.01)),
            "hll_url": ("url", lambda: HyperLogLog(14)),
            "cms_lang": ("lang", lambda: CountMinSketch(epsilon=0.0005, delta=0.01)),
            "tdigest_chars": ("n_chars", lambda: TDigest(200)),
            "kll_chars": ("n_chars", lambda: KLLSketch(200)),
        }, batch_size=batch)
    return time.monotonic() - t0


def run_scaling_child(ncpu: int) -> dict:
    """One scaling leg in this (fresh) process: warm workers, then time
    the two scaling pipelines — the compute-bound MinHash-LSH dedup (the
    scaling CRITERION pipeline) and the bandwidth-bound multi-sketch
    build (reported for completeness; see BASELINE.md on why a shared
    single-host memory bus caps it regardless of CPU count)."""
    import ray

    rd = _child_ray_init(ncpu)

    from archbloom_ray.datagen import pages_fixture
    from archbloom_ray.stages import minhash_lsh_pairs

    sub = pages_fixture(SCALING_MINHASH_ROWS, seed=9)
    t0 = time.monotonic()
    minhash_lsh_pairs(rd.read_parquet(sub, columns=["url", "text"]), "text", "url",
                      num_perm=64, bands=16, threshold=0.7).count()
    minhash_sec = time.monotonic() - t0

    build_sec = _headline_build_once(rd, BENCH_PAGES_ROWS)
    ray.shutdown()
    return {
        "cpus": ncpu,
        "minhash_docs_per_sec": round(SCALING_MINHASH_ROWS / minhash_sec, 1),
        "build_docs_per_sec": round(BENCH_PAGES_ROWS / build_sec, 1),
        "minhash_sec": round(minhash_sec, 2),
        "build_sec": round(build_sec, 2),
    }


def run_scaling() -> dict:
    """Same jobs, same inputs, fresh processes at SCALING_LO and
    SCALING_HI CPUs; median over SCALING_REPEATS (this host is a shared
    VM with heavy co-tenant noise — single runs are a lottery)."""
    from archbloom_ray.datagen import pages_fixture

    pages_fixture(BENCH_PAGES_ROWS, seed=42)
    pages_fixture(SCALING_MINHASH_ROWS, seed=9)

    def run(ncpu: int) -> dict:
        outs = []
        for _ in range(max(1, SCALING_REPEATS)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scaling-child", str(ncpu)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            outs.append(json.loads(out.strip().splitlines()[-1]))
        med = {}
        for k in ("minhash_docs_per_sec", "build_docs_per_sec", "minhash_sec", "build_sec"):
            med[k] = sorted(o[k] for o in outs)[len(outs) // 2]
        med["cpus"] = ncpu
        med["repeats"] = len(outs)
        return med

    lo, hi = run(SCALING_LO), run(SCALING_HI)
    factor = SCALING_HI / SCALING_LO
    mh_eff = (hi["minhash_docs_per_sec"] / lo["minhash_docs_per_sec"]) / factor
    build_eff = (hi["build_docs_per_sec"] / lo["build_docs_per_sec"]) / factor
    return {
        "metric": f"scaling_efficiency_{SCALING_LO}_to_{SCALING_HI}",
        # criterion pipeline: compute-bound MinHash dedup (BASELINE.md —
        # the multi-sketch build saturates this single host's shared
        # memory bus, which separate cluster nodes would not share)
        "value": round(mh_eff, 3),
        "unit": "ratio",
        "minhash_efficiency": round(mh_eff, 3),
        "build_efficiency": round(build_eff, 3),
        "lo": lo,
        "hi": hi,
        "pages_rows": BENCH_PAGES_ROWS,
        "minhash_rows": SCALING_MINHASH_ROWS,
        **host_speed_probe(),
    }


ROWS_PROBE_FACTOR = int(os.environ.get("GRAFT_ROWS_PROBE_FACTOR", "4"))
ROWS_PROBE_REPEATS = int(os.environ.get("GRAFT_ROWS_PROBE_REPEATS", "3"))


def run_rows_probe_child(rows: int) -> dict:
    """One rows-scaling leg in this (fresh) process: the headline build
    at `rows` rows, NUM_CPUS CPUs."""
    import ray

    rd = _child_ray_init(NUM_CPUS)
    sec = _headline_build_once(rd, rows)
    ray.shutdown()
    return {"rows": rows, "build_sec": round(sec, 2),
            "build_docs_per_sec": round(rows / sec, 1)}


def run_rows_probe() -> dict:
    """Rows-scaling probe (VERDICT r3 item 6, standing artifact): the
    headline build at BENCH_PAGES_ROWS and FACTOR× that, fresh process
    per leg, SAME num_cpus — throughput should be flat (ratio ≈ 1) if
    per-row cost is constant; a ratio < 0.9 flags super-linear cost
    (e.g. a stage that materializes or re-scans with corpus size).
    Median over ROWS_PROBE_REPEATS legs; host probe embedded so the
    number reads against the bus speed it was measured at."""
    from archbloom_ray.datagen import pages_fixture

    lo_rows = BENCH_PAGES_ROWS
    hi_rows = BENCH_PAGES_ROWS * ROWS_PROBE_FACTOR
    for r in (lo_rows, hi_rows):
        path = pages_fixture(r, seed=42)
        for name in sorted(os.listdir(path)):  # warm page cache
            with open(os.path.join(path, name), "rb") as f:
                while f.read(1 << 24):
                    pass

    def leg(rows: int) -> dict:
        outs = []
        for _ in range(max(1, ROWS_PROBE_REPEATS)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--rows-probe-child", str(rows)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__))).stdout
            outs.append(json.loads(out.strip().splitlines()[-1]))
        # median ONE field and derive the other so the reported
        # (sec, docs/s) pair always comes from a consistent run
        med_sec = sorted(o["build_sec"] for o in outs)[len(outs) // 2]
        return {"build_sec": med_sec,
                "build_docs_per_sec": round(rows / med_sec, 1),
                "rows": rows, "repeats": len(outs)}

    lo, hi = leg(lo_rows), leg(hi_rows)
    ratio = hi["build_docs_per_sec"] / lo["build_docs_per_sec"]
    return {
        "metric": f"rows_scaling_{lo_rows}_to_{hi_rows}",
        "value": round(ratio, 3),
        "unit": "ratio",
        "lo": lo,
        "hi": hi,
        "num_cpus": NUM_CPUS,
        **host_speed_probe(),
    }


CAPPED_STORE_BYTES = int(os.environ.get("GRAFT_CAPPED_STORE_BYTES",
                                        str(8 << 30)))
CAPPED_STORE_REPEATS = int(os.environ.get("GRAFT_CAPPED_STORE_REPEATS", "3"))


def run_capped_child(rows: int, store_bytes: int) -> dict:
    """One capped-store leg: headline build at `rows` rows with the
    object store capped to `store_bytes` (0 = uncapped); reports the
    session's spill volume so the artifact shows whether streaming
    execution needed the disk at all."""
    import ray

    rd = _child_ray_init(NUM_CPUS, object_store_memory=store_bytes or None)
    sec = _headline_build_once(rd, rows)
    spilled_mb = None
    try:
        # no gRPC in this sandbox, so read the raylet's own spill
        # report (cumulative "Spilled N MiB" info lines) instead of
        # the state API
        import glob
        import re

        sess = ray._private.worker.global_worker.node.get_session_dir_path()
        spilled_mb = 0.0
        for f in glob.glob(os.path.join(sess, "logs", "raylet.out")):
            for line in open(f, errors="ignore"):
                m = re.search(r"Spilled\s+(\d+)\s*MiB", line)
                if m:
                    spilled_mb = max(spilled_mb, float(m.group(1)))
    except Exception as e:
        spilled_mb = f"probe_failed:{type(e).__name__}"
    ray.shutdown()
    return {"rows": rows, "store_bytes": store_bytes,
            "build_sec": round(sec, 2),
            "build_docs_per_sec": round(rows / sec, 1),
            "spilled_mb": spilled_mb}


def run_capped_sharded_child(rows: int, store_bytes: int) -> dict:
    """One capped-store leg of the SHARDED bloom build — the
    cost-model escape whose exchange is independent of m: expected
    ~full throughput and zero spill at any cap the position rows fit."""
    import ray

    from archbloom_ray.datagen import pages_fixture
    from archbloom_ray.pipelines.build import build_sharded_bloom_states
    from archbloom_ray.sketches import BloomFilter

    rd = _child_ray_init(NUM_CPUS, object_store_memory=store_bytes or None)
    pages = pages_fixture(rows, seed=42)
    t0 = time.monotonic()
    build_sharded_bloom_states(
        rd.read_parquet(pages, columns=["url"]),
        "url", lambda: BloomFilter(rows, 0.01),
        num_shards=64, batch_size=262144)
    sec = time.monotonic() - t0
    spilled = None
    try:
        import glob
        import re

        sess = ray._private.worker.global_worker.node.get_session_dir_path()
        spilled = 0.0
        for f in glob.glob(os.path.join(sess, "logs", "raylet.out")):
            for line in open(f, errors="ignore"):
                m = re.search(r"Spilled\s+(\d+)\s*MiB", line)
                if m:
                    spilled = max(spilled, float(m.group(1)))
    except Exception as e:
        spilled = f"probe_failed:{type(e).__name__}"
    ray.shutdown()
    return {"rows": rows, "store_bytes": store_bytes,
            "build_sec": round(sec, 2),
            "build_docs_per_sec": round(rows / sec, 1),
            "spilled_mb": spilled}


def run_capped_store() -> dict:
    """Memory-bounded scale certification (VERDICT r4 item 4): the
    headline build at ROWS_PROBE_FACTOR× the bench rows, once with the
    default object store and once capped to CAPPED_STORE_BYTES
    (default 8 GiB).  Streaming execution with backpressure should
    never need the whole dataset resident, so throughput under the cap
    must hold (ratio ≥ 0.8) — the single-node proxy for 'no stage
    materializes the corpus' that rows-probe can't see (a plentiful
    store hides accidental materialization; a capped one stalls or
    spills on it).  Median over CAPPED_STORE_REPEATS fresh processes
    per leg; host probe embedded."""
    from archbloom_ray.datagen import pages_fixture

    rows = BENCH_PAGES_ROWS * ROWS_PROBE_FACTOR
    path = pages_fixture(rows, seed=42)
    for name in sorted(os.listdir(path)):      # warm page cache
        with open(os.path.join(path, name), "rb") as f:
            while f.read(1 << 24):
                pass

    def leg(store_bytes: int) -> dict:
        outs = []
        for _ in range(max(1, CAPPED_STORE_REPEATS)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--capped-child", str(rows), str(store_bytes)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__))).stdout
            outs.append(json.loads(out.strip().splitlines()[-1]))
        med_sec = sorted(o["build_sec"] for o in outs)[len(outs) // 2]
        spills = [o["spilled_mb"] for o in outs
                  if isinstance(o["spilled_mb"], (int, float))]
        return {"build_sec": med_sec,
                "build_docs_per_sec": round(rows / med_sec, 1),
                "store_bytes": store_bytes, "repeats": len(outs),
                "max_spilled_mb": max(spills) if spills else None}

    uncapped, capped = leg(0), leg(CAPPED_STORE_BYTES)
    ratio = capped["build_docs_per_sec"] / uncapped["build_docs_per_sec"]

    # the sharded-path leg (one run per cap; exchange independent of m
    # — zero spill expected at any cap the position rows fit)
    def sharded_leg(store_bytes: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--capped-sharded-child", str(rows), str(store_bytes)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    sh_un, sh_cap = sharded_leg(0), sharded_leg(CAPPED_STORE_BYTES)
    return {
        "metric": f"capped_store_throughput_ratio_{CAPPED_STORE_BYTES >> 30}gib",
        "value": round(ratio, 3),
        "unit": "ratio",
        "rows": rows,
        "uncapped": uncapped,
        "capped": capped,
        "sharded_uncapped": sh_un,
        "sharded_capped": sh_cap,
        "sharded_ratio": round(sh_cap["build_docs_per_sec"]
                               / sh_un["build_docs_per_sec"], 3),
        "num_cpus": NUM_CPUS,
        **host_speed_probe(),
    }


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        n = int(sys.argv[sys.argv.index("--scaling-child") + 1])
        print(json.dumps(run_scaling_child(n)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--capped-child" in sys.argv:
        i = sys.argv.index("--capped-child")
        print(json.dumps(run_capped_child(int(sys.argv[i + 1]),
                                          int(sys.argv[i + 2]))))
    elif "--capped-sharded-child" in sys.argv:
        i = sys.argv.index("--capped-sharded-child")
        print(json.dumps(run_capped_sharded_child(int(sys.argv[i + 1]),
                                                  int(sys.argv[i + 2]))))
    elif "--capped-store" in sys.argv:
        print(json.dumps(run_capped_store()))
    elif "--rows-probe-child" in sys.argv:
        n = int(sys.argv[sys.argv.index("--rows-probe-child") + 1])
        print(json.dumps(run_rows_probe_child(n)))
    elif "--rows-probe" in sys.argv:
        print(json.dumps(run_rows_probe()))
    else:
        import ray

        out = run_bench()
        ray.shutdown()
        print(json.dumps(out))
