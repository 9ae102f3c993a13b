"""``engine`` CLI — the distributed analogue of the reference's
``bloomtool`` (reference bin/bloomtool.c:367-602), plus engine-native
subcommands.

bloomtool parity (same verbs, sketch files are this engine's versioned
portable format rather than the reference's raw struct dumps):

    create     build a sketch from a parquet column / text-file lines
               (bloomtool.c:20-79: stdin lines → bloom_add → save)
    add        load a checkpoint, add more input, save (bloomtool.c:158-208)
    query      membership lookup, exit code 0/1 (bloomtool.c:81-105)
    info       print params + saturation + est. FPR (bloomtool.c:133-156)
    rename     relabel (bloomtool.c:107-131)
    merge      OR/union two sketch files (bloomtool.c:210-271)
    intersect  AND-combine + Jaccard estimate (bloomtool.c:273-358)

Engine-native:

    build      one-scan multi-sketch build over parquet (distributed)
    probe      batch membership of a parquet key column → parquet out

A Ray session is created here (the CLI owns it) — library code never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr and addr != "local":
            # inside `ray job submit` / an attached cluster: join it and
            # let the cluster own resources (num_cpus is a LOCAL knob)
            ray.init(address=addr, logging_level="ERROR")
        else:
            ray.init(address="local",
                     num_cpus=num_cpus or int(
                         os.environ.get("RAY_GRAFT_CPUS", "8")),
                     include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _make_sketch(kind: str, args) -> "object":
    from .sketches import (BlockedBloomFilter, BloomFilter,
                           ConservativeCountMinSketch,
                           CountingBloomFilter, CountingQuotientFilter,
                           CountMinSketch,
                           CuckooFilter, DDSketch, HyperLogLog, KLLSketch,
                           KMVSketch, QuotientFilter, ScalableBloomFilter,
                           SlidingHyperLogLog, SparseHLL,
                           TDigest, ThetaSketch,
                           RoaringBitmap, TimeDecayingBloomFilter,
                           TimeDecayingCountingBloomFilter)
    from .sketches import (DynamicDistinct, GroupSizeSampler, ReqSketch,
                           VarOptSampler)

    kinds = {
        "bloom": lambda: BloomFilter(args.expected, args.accuracy),
        "blockedbloom": lambda: BlockedBloomFilter(args.expected, args.accuracy),
        # unknown-n: --expected seeds only the FIRST stage's capacity
        "sbloom": lambda: ScalableBloomFilter(
            max(args.expected, 1), args.accuracy),
        "cbloom": lambda: CountingBloomFilter(args.expected, args.accuracy, args.counter_width),
        "tdbloom": lambda: TimeDecayingBloomFilter(args.expected, args.accuracy, args.timeout),
        "tdcbloom": lambda: TimeDecayingCountingBloomFilter(
            args.expected, args.accuracy, args.timeout),
        "cuckoo": lambda: CuckooFilter(max(16, args.expected // 4), 4),
        # deletable AND mergeable AMQ (RSQF layout) + counting variant
        "qf": lambda: QuotientFilter(args.expected, args.accuracy),
        "cqf": lambda: CountingQuotientFilter(args.expected, args.accuracy),
        "hll": lambda: HyperLogLog(args.precision),
        "sparsehll": lambda: SparseHLL(args.precision),
        "slidinghll": lambda: SlidingHyperLogLog(args.precision),
        "cms": lambda: CountMinSketch(epsilon=args.epsilon, delta=args.delta),
        # conservative update: tighter point estimates, same bound
        "cucms": lambda: ConservativeCountMinSketch(
            epsilon=args.epsilon, delta=args.delta),
        "tdigest": lambda: TDigest(args.compression),
        "kll": lambda: KLLSketch(args.kll_k),
        "ddsketch": lambda: DDSketch(alpha=args.dd_alpha),
        "kmv": lambda: KMVSketch(args.sketch_k),
        "theta": lambda: ThetaSketch(args.sketch_k),
        # integer-key exact set (raises a clean SketchError on strings)
        "roaring": lambda: RoaringBitmap(),
        # session-8 additions; llf is deliberately absent (its arrival-
        # keyed update needs occurrence ids this path doesn't carry)
        "req": lambda: ReqSketch(args.kll_k),
        "dyndist": lambda: DynamicDistinct(),
        "gss": lambda: GroupSizeSampler(args.sketch_k, args.precision),
        # unweighted CLI ingest (weight 1/row); weighted builds go
        # through the library API (update_weighted)
        "varopt": lambda: VarOptSampler(args.sketch_k),
    }
    return kinds[kind]()


def _load(path: str):
    from .sketches import sketch_from_bytes

    with open(path, "rb") as f:
        return sketch_from_bytes(f.read())


def _save(sk, path: str):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(sk.to_bytes())
    os.replace(tmp, path)


def _input_dataset(args):
    import ray.data as rd

    if args.input.endswith(".parquet"):
        return rd.read_parquet(args.input, columns=[args.column]), args.column
    # text-file parity path: one element per line, trailing \r\n stripped
    # (reference strip(), bloomtool.c:13-18)
    ds = rd.read_text(args.input)
    return ds, "text"


def cmd_create(args):
    _ray_init(args.num_cpus)
    from .pipelines.build import build_sketch

    if args.kind == "slidinghll":
        # event-time sketch: needs (key, time) — parquet two-column read
        if not getattr(args, "secs_column", None) \
                or not args.input.endswith(".parquet"):
            print(json.dumps({"error": "--kind slidinghll needs a parquet "
                                       "input and --secs-column"}))
            sys.exit(2)
        import ray.data as rd

        from .pipelines.build import build_event_time_sketch
        from .sketches import SlidingHyperLogLog

        ds2 = rd.read_parquet(args.input,
                              columns=[args.column, args.secs_column])
        built = build_event_time_sketch(
            ds2, args.column, args.secs_column,
            lambda: SlidingHyperLogLog(args.precision),
            batch_size=args.batch_size)
        if args.name:
            built.name = args.name
        _save(built, args.output)
        print(json.dumps({"saved": args.output, **_info_dict(built)}))
        return

    ds, col = _input_dataset(args)
    sk = _make_sketch(args.kind, args)
    factory = lambda proto=sk.to_bytes(): __import__(
        "archbloom_ray.sketches", fromlist=["sketch_from_bytes"]
    ).sketch_from_bytes(proto)
    built = build_sketch(ds, col, factory, batch_size=args.batch_size)
    if args.name:
        built.name = args.name
    _save(built, args.output)
    print(json.dumps({"saved": args.output, **_info_dict(built)}))


def _persist_sharded(outdir: str, states: dict, kind: str) -> int:
    """Write ``{shard: bytes}`` as part-<s>.state files + a checkpoint-
    style manifest (sha256 per shard, torn writes fail closed on any
    later verify)."""
    from .pipelines.checkpoint import ENGINE_VERSION, _sha256

    os.makedirs(outdir, exist_ok=True)
    rows = []
    for s, b in sorted(states.items()):
        path = os.path.join(outdir, f"part-{s}.state")
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(b)
        os.replace(tmp, path)
        rows.append({"shard_id": str(s), "kind": f"{kind}_shard",
                     "state_sha256": _sha256(b), "state_bytes": len(b),
                     "engine_version": ENGINE_VERSION})
    with open(os.path.join(outdir, "manifest.jsonl"), "a") as mf:
        for row in rows:
            mf.write(json.dumps(row) + "\n")
    return len(rows)


def cmd_create_sharded(args):
    """Build a key-range/key-hash SHARDED filter into a directory —
    the 10^12-key layout where the shard map IS the filter and no
    single machine ever holds the whole structure.  bloom shards the
    bitmap by position (bit-for-bit vs monolithic, resumable via the
    checkpoint manifest); sbloom/cuckoo shard by key hash
    (fmix64-routed; unknown-n growth / distributed deletes)."""
    _ray_init(args.num_cpus)

    ds, col = _input_dataset(args)
    outdir = args.output
    os.makedirs(outdir, exist_ok=True)
    S = args.num_shards
    report = {}
    if args.kind == "bloom":
        from .pipelines.checkpoint import checkpointed_sharded_bloom

        exp, acc = args.expected, args.accuracy
        states, report = checkpointed_sharded_bloom(
            ds, col, lambda: __import__(
                "archbloom_ray.sketches", fromlist=["BloomFilter"]
            ).BloomFilter(exp, acc),
            outdir, num_shards=S, batch_size=args.batch_size)
        params = {"expected": exp, "accuracy": acc}
    elif args.kind == "sbloom":
        from .pipelines import build_sharded_sbf_states

        cap = max(1, args.expected // S)
        acc = args.accuracy
        states = build_sharded_sbf_states(
            ds, col, lambda: __import__(
                "archbloom_ray.sketches", fromlist=["ScalableBloomFilter"]
            ).ScalableBloomFilter(cap, acc),
            num_shards=S, batch_size=args.batch_size)
        _persist_sharded(outdir, states, "sbloom")
        params = {"initial_capacity": cap, "accuracy": acc}
    elif args.kind == "cbloom":
        from .pipelines import build_sharded_cbloom_states
        from .sketches import CountingBloomFilter

        exp, acc, cw = args.expected, args.accuracy, args.counter_width
        states = build_sharded_cbloom_states(
            ds, col, lambda: CountingBloomFilter(exp, acc, width=cw),
            num_shards=S, batch_size=args.batch_size)
        _persist_sharded(outdir, states, "cbloom")
        params = {"expected": exp, "accuracy": acc, "width": cw}
    elif args.kind in ("tdbloom", "tdcbloom"):
        import pyarrow as pa
        import pyarrow.compute as pc

        from .pipelines import (build_sharded_tdbloom_states,
                                build_sharded_tdcbloom_states)

        if not args.secs_column:
            print(json.dumps({"error": "--secs-column is required for "
                                       f"--kind {args.kind}"}))
            sys.exit(2)
        import ray.data as rd

        ds2 = rd.read_parquet(args.input, columns=[col, args.secs_column])

        def to_secs(batch: pa.Table) -> pa.Table:
            c = batch[args.secs_column]
            if pa.types.is_timestamp(c.type):
                s = pc.divide(pc.cast(c, pa.int64()),
                              pa.scalar(1_000_000, pa.int64()))
            else:
                s = pc.cast(c, pa.int64())
            return pa.table({col: batch[col], "__secs": s})

        keyed = ds2.map_batches(to_secs, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

        def bounds(batch: pa.Table) -> pa.Table:
            return pa.table({
                "lo": pa.array([pc.min(batch["__secs"]).as_py()],
                               pa.int64()),
                "hi": pa.array([pc.max(batch["__secs"]).as_py()],
                               pa.int64())})

        bd = keyed.map_batches(bounds, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        lo = min(r["lo"] for r in bd)
        hi = max(r["hi"] for r in bd)
        exp, acc, to_ = args.expected, args.accuracy, args.timeout
        # coarsen the clock so the whole ingest span fits inside the
        # slot width's max_time (tdbloom.c:92-102 wrap) — otherwise the
        # global guard / tick wrap corrupts freshness.  Quantization
        # error of the user's timeout is ≤ one unit (reported below).
        span = max(hi - lo, 1)
        unit = max(1, span // 4000)
        if args.kind == "tdbloom":
            from .sketches.tdbloom import _pick_width

            for _ in range(4):
                timeout_u = max(1, to_ // unit)
                _, max_time = _pick_width(timeout_u)
                if span // unit < max_time:
                    break
                unit = span // (max_time - 1) + 1
        else:
            # tdcbloom picks its timer width explicitly: smallest of
            # 8/16/32/64 BITS whose max_time exceeds both the ingest
            # span and the timeout (in units) — no wrap, no iteration
            timeout_u = max(1, to_ // unit)
            need = max(span // unit, timeout_u)
            timer_width = next(w for w in (8, 16, 32, 64)
                               if (1 << w) - 1 > need)

        def to_units(batch: pa.Table) -> pa.Table:
            u = pc.divide(pc.subtract(batch["__secs"],
                                      pa.scalar(lo, pa.int64())),
                          pa.scalar(unit, pa.int64()))
            return pa.table({col: batch[col], "__units": u})

        units_ds = keyed.map_batches(to_units, batch_format="pyarrow",
                                     zero_copy_batch=True)
        params = {"expected": exp, "accuracy": acc, "timeout": to_,
                  "timeout_units": timeout_u, "unit": unit,
                  "start_time": lo, "max_secs": hi}
        if args.kind == "tdbloom":
            states = build_sharded_tdbloom_states(
                units_ds, col, "__units", lambda: __import__(
                    "archbloom_ray.sketches",
                    fromlist=["TimeDecayingBloomFilter"]
                ).TimeDecayingBloomFilter(exp, acc, timeout_u, start_time=0),
                num_shards=S, batch_size=args.batch_size)
        else:
            from .sketches import TimeDecayingCountingBloomFilter

            cw = args.counter_width
            states = build_sharded_tdcbloom_states(
                units_ds, col, "__units",
                lambda: TimeDecayingCountingBloomFilter(
                    exp, acc, timeout_u, counter_width=cw,
                    timer_width=timer_width, start_time=0),
                num_shards=S, batch_size=args.batch_size)
            params.update({"counter_width": cw,
                           "timer_width": timer_width})
        _persist_sharded(outdir, states, args.kind)
    elif args.kind in ("qf", "cqf"):
        from .pipelines import (build_sharded_cqf_states,
                                build_sharded_qf_states)
        from .sketches import CountingQuotientFilter, QuotientFilter

        exp, acc = args.expected, args.accuracy
        if args.kind == "qf":
            states = build_sharded_qf_states(
                ds, col, lambda: QuotientFilter(exp, acc),
                num_shards=S, batch_size=args.batch_size)
        else:
            states = build_sharded_cqf_states(
                ds, col, lambda: CountingQuotientFilter(exp, acc),
                num_shards=S, batch_size=args.batch_size)
        _persist_sharded(outdir, states, args.kind)
        params = {"expected": exp, "accuracy": acc}
    else:  # cuckoo
        from .pipelines import build_sharded_cuckoo_states

        buckets = max(16, args.expected // S // 2)  # ≤ ~50% load at 4/slot
        states = build_sharded_cuckoo_states(
            ds, col, lambda: __import__(
                "archbloom_ray.sketches", fromlist=["CuckooFilter"]
            ).CuckooFilter(buckets, 4),
            num_shards=S, batch_size=args.batch_size)
        _persist_sharded(outdir, states, "cuckoo")
        params = {"num_buckets": buckets, "bucket_size": 4}
    shardmap = {"kind": args.kind, "num_shards": S, "params": params,
                "column": col}
    tmp = os.path.join(outdir, "shardmap.json.tmp")
    with open(tmp, "w") as f:
        json.dump(shardmap, f)
    os.replace(tmp, os.path.join(outdir, "shardmap.json"))
    print(json.dumps({"saved": outdir, "shards": len(states),
                      **shardmap, **report}))


def cmd_merge_sharded(args):
    """Fold sharded directory B into A → OUT (daily-increment algebra
    at the directory surface).  Requires identical shardmaps.  bloom
    merges by shard-local OR (`pipelines.merge_sharded_states`),
    sbloom by per-shard stage concatenation (union FPR bound ADDS —
    prefer `sharded_sbf_ingest` with raw keys when the increment is
    still available), cuckoo by best-effort re-insert (raises when a
    shard exceeds capacity, like the in-memory merge)."""
    import glob as _glob

    def load_dir(d):
        with open(os.path.join(d, "shardmap.json")) as f:
            meta = json.load(f)
        states = {}
        for p in _glob.glob(os.path.join(d, "part-*.state")):
            s = int(os.path.basename(p)[len("part-"):-len(".state")])
            with open(p, "rb") as f:
                states[s] = f.read()
        return meta, states

    ma, sa = load_dir(args.a)
    mb, sb = load_dir(args.b)
    if ma != mb:
        print(json.dumps({"error": f"shardmap mismatch: {ma} != {mb}"}))
        sys.exit(2)
    kind, S, p_ = ma["kind"], ma["num_shards"], ma["params"]
    if kind in ("tdbloom", "tdcbloom"):
        # td shard states are raw slot slices on a per-directory unit
        # clock (start_time/unit derive from each ingest's own span) —
        # two directories share a shardmap only when the clocks agree,
        # and even then slot-max merging belongs to the library path
        # with ONE pinned clock.  Re-ingest increments with
        # build_sharded_td{,c}bloom_states / merge_sharded_states instead.
        print(json.dumps({"error": f"merge-sharded does not support "
                                   f"{kind} directories; rebuild with a "
                                   "shared pinned clock via the library "
                                   "(merge_sharded_states)"}))
        sys.exit(2)
    if kind == "bloom":
        from .pipelines import merge_sharded_states
        from .sketches import BloomFilter

        merged = merge_sharded_states(
            sa, sb, lambda: BloomFilter(p_["expected"], p_["accuracy"]),
            num_shards=S)
    elif kind == "cbloom":
        # counter slices saturating-add position-wise (= any sequential
        # ingest order; pipelines.merge_sharded_states)
        from .pipelines import merge_sharded_states
        from .sketches import CountingBloomFilter

        merged = merge_sharded_states(
            sa, sb, lambda: CountingBloomFilter(
                p_["expected"], p_["accuracy"], width=p_["width"]),
            num_shards=S)
    else:
        from .sketches.base import sketch_from_bytes

        merged = {}
        for s in sorted(set(sa) | set(sb)):
            if s not in sa:
                merged[s] = sb[s]
            elif s not in sb:
                merged[s] = sa[s]
            else:
                x = sketch_from_bytes(sa[s])
                x.merge(sketch_from_bytes(sb[s]))
                merged[s] = x.to_bytes()
        if kind in ("qf", "cqf"):
            # per-shard merges only see their own range: re-check the
            # GLOBAL 2^q capacity the build enforces (union ==
            # monolithic contract) so an over-full merged directory
            # fails here, not at a later assemble
            from .sketches.base import sketch_from_bytes as _sfb

            total = sum(_sfb(b).fps.size for b in merged.values())
            slots = _sfb(next(iter(merged.values()))).num_slots \
                if merged else 0
            if merged and total > slots:
                print(json.dumps({"error": f"merged quotient filter "
                                  f"overflows capacity: {total} "
                                  f"fingerprints > 2^q = {slots} — "
                                  f"rebuild with a larger --expected"}))
                sys.exit(2)
    os.makedirs(args.output, exist_ok=True)
    n = _persist_sharded(args.output, merged, kind)
    tmp = os.path.join(args.output, "shardmap.json.tmp")
    with open(tmp, "w") as f:
        json.dump(ma, f)
    os.replace(tmp, os.path.join(args.output, "shardmap.json"))
    print(json.dumps({"saved": args.output, "shards": n, "kind": kind}))


def cmd_query_sharded(args):
    """Single-key probe of a sharded-filter directory — LOCAL and
    Ray-free: route the key with the same pure shard function the
    build used, read ONLY the owning shard's state file, and check.
    Exit code 0 present / 1 absent, like ``query``."""
    import numpy as np
    import pyarrow as pa

    with open(os.path.join(args.dir, "shardmap.json")) as f:
        meta = json.load(f)
    kind, S, params = meta["kind"], meta["num_shards"], meta["params"]
    elem = pa.array([args.element], type=pa.string())

    def shard_bytes(s: int) -> bytes | None:
        path = os.path.join(args.dir, f"part-{s}.state")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    if kind == "bloom":
        from .pipelines.build import _bloom_shard_bytes
        from .sketches import BloomFilter

        tpl = BloomFilter(params["expected"], params["accuracy"])
        B = _bloom_shard_bytes((tpl.size + 7) // 8, S)
        pos = tpl._positions(elem).ravel()
        present = True
        for p in pos:
            blob = shard_bytes(int((p >> 3) // B))
            if blob is None:
                present = False
                break
            byte = blob[int(p >> 3) - int((p >> 3) // B) * B]
            if not (byte >> (int(p) & 7)) & 1:
                present = False
                break
    elif kind == "cbloom":
        # position-routed like bloom, over the logical counter dtype:
        # count = min over the k owning slots, present = count > 0
        from .hashing import make_hashes_batch, mmh3_128_batch
        from .sketches import CountingBloomFilter

        tpl = CountingBloomFilter(params["expected"], params["accuracy"],
                                  width=params["width"])
        C = max(1, -(-tpl.size // S))
        it = tpl.counters.dtype.itemsize
        h1, h2 = mmh3_128_batch(elem)
        pos = (make_hashes_batch(h1, h2, tpl.hashcount)
               % np.uint64(tpl.size)).astype(np.int64).ravel()
        cnt = None
        for p in pos:
            s = int(p // C)
            blob = shard_bytes(s)
            if blob is None:
                cnt = 0
                break
            off = (int(p) - s * C) * it
            v = int(np.frombuffer(blob, dtype=tpl.counters.dtype,
                                  count=1, offset=off)[0])
            cnt = v if cnt is None else min(cnt, v)
        present = bool(cnt)
        print(json.dumps({"element": args.element, "present": present,
                          "count": int(cnt), "kind": kind}))
        sys.exit(0 if present else 1)
    elif kind == "tdcbloom":
        # freshness needs the shared clock, so assemble locally like
        # tdbloom; counts answer with the staleness rule applied
        import glob as _glob

        from .pipelines import assemble_sharded_tdcbloom
        from .sketches import TimeDecayingCountingBloomFilter

        factory = lambda: TimeDecayingCountingBloomFilter(
            params["expected"], params["accuracy"],
            params["timeout_units"], counter_width=params["counter_width"],
            timer_width=params["timer_width"], start_time=0)
        states = {}
        for p in _glob.glob(os.path.join(args.dir, "part-*.state")):
            s = int(os.path.basename(p)[len("part-"):-len(".state")])
            with open(p, "rb") as f:
                states[s] = f.read()
        sk = assemble_sharded_tdcbloom(states, factory, num_shards=S)
        at = args.at if args.at is not None else params["max_secs"]
        now_u = (at - params["start_time"]) // params["unit"]
        present = bool(sk.lookup(args.element, now=now_u))
        cnt = sk.count(args.element, now=now_u)
        print(json.dumps({"element": args.element, "present": present,
                          "count": int(cnt), "kind": kind}))
        sys.exit(0 if present else 1)
    elif kind == "tdbloom":
        # freshness needs the global max-time guard, so the slot map
        # assembles locally (still Ray-free; states live on one disk
        # at CLI scale).  --at defaults to the newest ingested second.
        import glob as _glob

        from .pipelines import assemble_sharded_tdbloom
        from .sketches import TimeDecayingBloomFilter

        factory = lambda: TimeDecayingBloomFilter(
            params["expected"], params["accuracy"],
            params["timeout_units"], start_time=0)
        states = {}
        for p in _glob.glob(os.path.join(args.dir, "part-*.state")):
            s = int(os.path.basename(p)[len("part-"):-len(".state")])
            with open(p, "rb") as f:
                states[s] = f.read()
        sk = assemble_sharded_tdbloom(states, factory, num_shards=S)
        at = args.at if args.at is not None else params["max_secs"]
        now_u = (at - params["start_time"]) // params["unit"]
        present = bool(sk.lookup(args.element, now=now_u))
    elif kind in ("qf", "cqf"):
        # fingerprint-RANGE routing: shard = fp // ceil(2^p / S), the
        # same pure function the build used (pipelines/build.py)
        from .hashing import mmh3_128_batch
        from .pipelines.build import _qf_shard_width
        from .sketches import CountingQuotientFilter, QuotientFilter
        from .sketches.base import sketch_from_bytes

        cls = QuotientFilter if kind == "qf" else CountingQuotientFilter
        tpl = cls(params["expected"], params["accuracy"])
        h1, h2 = mmh3_128_batch(elem)
        fp = (h1.astype(np.uint64) ^ h2.astype(np.uint64)) \
            >> np.uint64(64 - tpl.p)
        s = int(fp[0] // _qf_shard_width(tpl.p, S))
        blob = shard_bytes(s)
        sk = sketch_from_bytes(blob) if blob is not None else None
        present = bool(sk is not None and sk.member_fps(fp)[0])
        if kind == "cqf":
            cnt = int(sk.count_fps(fp)[0]) if sk is not None else 0
            print(json.dumps({"element": args.element, "present": present,
                              "count": cnt, "kind": kind}))
            sys.exit(0 if present else 1)
    else:
        from .hashing import fmix64_batch, mmh3_128_batch, mmh3_32_batch
        from .sketches.base import sketch_from_bytes

        if kind == "sbloom":
            h1, h2 = mmh3_128_batch(elem)
            s = int(fmix64_batch(h1)[0] % np.uint64(S))
            blob = shard_bytes(s)
            present = bool(blob is not None and
                           sketch_from_bytes(blob)._lookup_hashes(h1, h2)[0])
        else:  # cuckoo
            h = mmh3_32_batch(elem)
            s = int(fmix64_batch(h.astype(np.uint64))[0] % np.uint64(S))
            blob = shard_bytes(s)
            present = bool(blob is not None and
                           sketch_from_bytes(blob).lookup_hashes32(h)[0])
    print(json.dumps({"element": args.element, "present": present,
                      "kind": kind}))
    sys.exit(0 if present else 1)


def cmd_add(args):
    _ray_init(args.num_cpus)
    from .pipelines.build import build_sketch

    base = _load(args.sketch)
    ds, col = _input_dataset(args)
    # build a fresh delta over the new input, then merge into the base
    delta = build_sketch(ds, col, lambda: _fresh_like(base), batch_size=args.batch_size)
    base.merge(delta)
    _save(base, args.sketch)
    print(json.dumps({"saved": args.sketch, **_info_dict(base)}))


def _fresh_like(sk):
    cls = type(sk)
    meta = sk._meta()
    fresh = cls._from_meta(meta)
    if hasattr(fresh, "stages"):
        # scalable chains: the stage list is accumulated STATE, not a
        # parameter — a delta build must start empty or it would carry
        # phantom fill counts into the concat merge
        fresh.clear()
    return fresh


def cmd_create_static(args):
    """Static structures (xor / binary fuse / retrieval map) need every
    key at construction — one pruned parquet read, single-machine
    build (CLI-scale inputs; corpus-scale builds go through the
    sharded library API, pipelines/staticfilter.py)."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sketches import BinaryFuseFilter, XorFilter, XorMap

    if not args.input.endswith(".parquet"):
        print(json.dumps({"error": "create-static reads parquet input"}))
        sys.exit(2)
    if args.kind == "xormap":
        if not args.value_column:
            print(json.dumps({"error": "--value-column required for "
                              "--kind xormap"}))
            sys.exit(2)
        t = pq.read_table(args.input,
                          columns=[args.column, args.value_column])
        sk = XorMap.build_arrow_values(
            t[args.column], np.asarray(t[args.value_column]),
            bits=args.bits, name=args.name)
    else:
        cls = XorFilter if args.kind == "xor" else BinaryFuseFilter
        t = pq.read_table(args.input, columns=[args.column])
        sk = cls.build_arrow(t[args.column], bits=args.bits, name=args.name)
    _save(sk, args.output)
    out = {"saved": args.output, "type": type(sk).__name__,
           "n": sk.n, "bits_per_key": round(sk.bits_per_key, 3)}
    print(json.dumps(out))


def cmd_query(args):
    from .sketches import CountingQuotientFilter, XorMap

    sk = _load(args.sketch)
    if isinstance(sk, XorMap):
        # retrieval map: the answer is the value (exact for built keys)
        print(json.dumps({"element": args.element,
                          "value": sk.get(args.element)}))
        sys.exit(0)
    if not hasattr(sk, "lookup"):
        if hasattr(sk, "count"):
            # frequency sketches (cms/cucms): the answer is the
            # estimate — no membership semantics, exit 0 always
            print(json.dumps({"element": args.element,
                              "count": int(sk.count(args.element)),
                              "type": type(sk).__name__}))
            sys.exit(0)
        print(json.dumps({"error": f"{type(sk).__name__} has no "
                          "element query (use info / profile)"}))
        sys.exit(2)
    present = sk.lookup(args.element)
    out = {"element": args.element, "present": bool(present)}
    if isinstance(sk, CountingQuotientFilter):
        out["count"] = sk.count(args.element)
    print(json.dumps(out))
    sys.exit(0 if present else 1)


def cmd_info(args):
    if os.path.isdir(args.sketch):
        # create-sharded directory: shard-map level report
        import glob as _glob

        with open(os.path.join(args.sketch, "shardmap.json")) as f:
            meta = json.load(f)
        parts = sorted(_glob.glob(os.path.join(args.sketch, "part-*.state")))
        sizes = [os.path.getsize(p) for p in parts]
        manifest_rows = 0
        mpath = os.path.join(args.sketch, "manifest.jsonl")
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest_rows = sum(1 for _ in f)
        print(json.dumps({
            "type": "sharded", **meta, "shards_present": len(parts),
            "total_state_bytes": sum(sizes),
            "max_shard_bytes": max(sizes) if sizes else 0,
            "manifest_rows": manifest_rows,
        }))
        return
    sk = _load(args.sketch)
    print(json.dumps(_info_dict(sk)))


def _info_dict(sk) -> dict:
    from .sketches import Sketch

    out = {"type": type(sk).__name__, "name": getattr(sk, "name", None)}
    if hasattr(sk, "n_entries"):
        out["n_entries"] = sk.n_entries()
    fin = sk.finalize()
    if isinstance(fin, dict):
        out.update(fin)
    elif not isinstance(fin, Sketch):  # base-class finalize returns self
        out["estimate"] = fin
    return out


def cmd_rename(args):
    sk = _load(args.sketch)
    sk.name = args.name
    _save(sk, args.sketch)
    print(json.dumps({"renamed": args.sketch, "name": args.name}))


def cmd_merge(args):
    a, b = _load(args.a), _load(args.b)
    a.merge(b)
    _save(a, args.output)
    print(json.dumps({"saved": args.output, **_info_dict(a)}))


def cmd_intersect(args):
    a, b = _load(args.a), _load(args.b)
    est = a.estimate_intersection(b)
    a.intersect(b)
    _save(a, args.output)
    print(json.dumps({"saved": args.output, "jaccard_estimate_pct": est}))


def cmd_probe(args):
    _ray_init(args.num_cpus)
    import ray.data as rd

    from .pipelines.query import membership

    ds = rd.read_parquet(args.input, columns=[args.column])
    if os.path.isdir(args.sketch):
        # create-sharded directory: batch probe without assembly —
        # the shard map broadcasts once, keys route per batch
        with open(os.path.join(args.sketch, "shardmap.json")) as f:
            meta = json.load(f)
        states = {}
        import glob as _glob
        for p in _glob.glob(os.path.join(args.sketch, "part-*.state")):
            s = int(os.path.basename(p)[len("part-"):-len(".state")])
            with open(p, "rb") as f:
                states[s] = f.read()
        kind, S = meta["kind"], meta["num_shards"]
        if kind == "bloom":
            from .pipelines import sharded_bloom_probe
            from .sketches import BloomFilter

            p_ = meta["params"]
            out = sharded_bloom_probe(
                ds, states, args.column,
                lambda: BloomFilter(p_["expected"], p_["accuracy"]),
                num_shards=S)
        elif kind == "cbloom":
            from .pipelines import sharded_cbloom_probe
            from .sketches import CountingBloomFilter

            p_ = meta["params"]
            out = sharded_cbloom_probe(
                ds, states, args.column,
                lambda: CountingBloomFilter(p_["expected"], p_["accuracy"],
                                            width=p_["width"]),
                num_shards=S, method="count")
        elif kind == "tdcbloom":
            import ray as _ray
            import pyarrow as pa

            from .pipelines import assemble_sharded_tdcbloom
            from .proc_cache import cached_instance
            from .sketches import TimeDecayingCountingBloomFilter

            p_ = meta["params"]
            sk = assemble_sharded_tdcbloom(
                states, lambda: TimeDecayingCountingBloomFilter(
                    p_["expected"], p_["accuracy"], p_["timeout_units"],
                    counter_width=p_["counter_width"],
                    timer_width=p_["timer_width"], start_time=0),
                num_shards=S)
            at = args.at if getattr(args, "at", None) is not None \
                else p_["max_secs"]
            now_u = (at - p_["start_time"]) // p_["unit"]
            blob_ref = _ray.put(sk.to_bytes())

            def tdc_probe(batch: pa.Table) -> pa.Table:
                from .sketches.base import sketch_from_bytes

                f = cached_instance(("cli_tdc_probe", blob_ref.hex()),
                                    lambda: sketch_from_bytes(
                                        _ray.get(blob_ref)))
                return batch.append_column(
                    "count",
                    pa.array(f.count_batch(batch[args.column],
                                           now=now_u)))

            out = ds.map_batches(tdc_probe, batch_format="pyarrow",
                                 zero_copy_batch=True)
        elif kind == "sbloom":
            from .pipelines import sharded_sbf_probe

            out = sharded_sbf_probe(ds, states, args.column, num_shards=S)
        elif kind == "tdbloom":
            import pyarrow as pa

            from .pipelines import assemble_sharded_tdbloom
            from .sketches import TimeDecayingBloomFilter

            p_ = meta["params"]
            sk = assemble_sharded_tdbloom(
                states, lambda: TimeDecayingBloomFilter(
                    p_["expected"], p_["accuracy"], p_["timeout_units"],
                    start_time=0),
                num_shards=S)
            at = args.at if getattr(args, "at", None) is not None \
                else p_["max_secs"]
            now_u = (at - p_["start_time"]) // p_["unit"]
            import ray as _ray

            from .proc_cache import cached_instance

            blob_ref = _ray.put(sk.to_bytes())

            def td_probe(batch: pa.Table) -> pa.Table:
                from .sketches.base import sketch_from_bytes

                f = cached_instance(("cli_td_probe", blob_ref.hex()),
                                    lambda: sketch_from_bytes(
                                        _ray.get(blob_ref)))
                return batch.append_column(
                    "present",
                    pa.array(f.lookup_batch(batch[args.column],
                                            now=now_u)))

            out = ds.map_batches(td_probe, batch_format="pyarrow",
                                 zero_copy_batch=True)
        elif kind in ("qf", "cqf"):
            from .pipelines import sharded_qf_probe
            from .sketches import CountingQuotientFilter, QuotientFilter

            p_ = meta["params"]
            cls = QuotientFilter if kind == "qf" else CountingQuotientFilter
            out = sharded_qf_probe(
                ds, states, args.column,
                lambda: cls(p_["expected"], p_["accuracy"]),
                num_shards=S,
                method="count_batch" if kind == "cqf" else "lookup_batch",
                out_column="count" if kind == "cqf" else "present")
        else:
            from .pipelines import sharded_cuckoo_probe

            out = sharded_cuckoo_probe(ds, states, args.column,
                                       num_shards=S)
    else:
        sk = _load(args.sketch)
        out = membership(ds, sk, args.column, concurrency=args.concurrency)
    out.write_parquet(args.output)
    print(json.dumps({"written": args.output}))


def cmd_transform(args):
    """Training-data transform over parquet shards with RESUMABLE
    per-shard partitioned output (pipelines.write.resumable_shard_map):
    a re-run after failure skips every finished shard."""
    _ray_init(args.num_cpus)
    import glob as _glob

    import pyarrow as pa

    from .pipelines.write import resumable_shard_map

    if os.path.isdir(args.input):
        paths = sorted(_glob.glob(os.path.join(args.input, "*.parquet"))) or sorted(
            _glob.glob(os.path.join(args.input, "part-*")))
    else:
        paths = [args.input]
    ops = args.ops.split(",")

    def transform(t: pa.Table) -> pa.Table:
        from .stages.text import (LanguageId, fingerprint_batch,
                                  quality_features_arrow, quality_score)
        import numpy as np

        out = t
        if "quality" in ops:
            feat = quality_features_arrow(t[args.column])
            for name, arr in feat.items():
                if name not in out.column_names:
                    out = out.append_column(name, pa.array(arr))
            out = out.append_column("quality_score", pa.array(quality_score(feat)))
        if "fingerprint" in ops:
            fps = fingerprint_batch(t[args.column])
            out = out.append_column("fingerprint", pa.array(fps.astype(np.int64)))
        if "langid" in ops:
            preds = LanguageId(args.column).classify_arrow(t[args.column])
            out = out.append_column("lang_pred", pa.array(list(preds), type=pa.string()))
        return out

    report = resumable_shard_map(paths, transform, args.output,
                                 batch_rows=args.batch_size)
    print(json.dumps({"output": args.output, **report}))


def cmd_run(args):
    """Run any named ``queries()`` pipeline over a table directory and
    print (or write) the result — the ``ray job submit`` entry point:
    ``python -m archbloom_ray.cli run lang_doc_counts --sf-dir DIR
    [--out out.parquet]``.  ``--list`` enumerates the catalog."""
    from . import queries as q

    catalog = q.queries()
    if args.name == "list":
        for name in sorted(catalog):
            print(name)
        return
    if args.name not in catalog:
        raise SystemExit(f"unknown query {args.name!r} — try 'run list'")
    _ray_init(args.num_cpus)
    res = catalog[args.name](args.sf_dir)
    import pyarrow as pa

    stats = None
    if getattr(args, "stats", False) and not hasattr(res, "stats"):
        import sys
        print("note: query returned a materialized result (not a "
              "Ray Dataset) — no per-operator stats to report",
              file=sys.stderr)
    if isinstance(res, pa.Table):
        pass
    elif hasattr(res, "stats"):          # ray Dataset
        df = res.to_pandas()
        if getattr(args, "stats", False):
            stats = res.stats()          # per-operator wall/rows/bytes
        res = pa.Table.from_pandas(df)
    else:                                # pandas DataFrame
        res = pa.Table.from_pandas(res)
    if stats:
        import sys
        print(stats, file=sys.stderr)
    if args.out:
        pa.parquet.write_table(res, args.out)
        print(json.dumps({"query": args.name, "rows": res.num_rows,
                          "out": args.out}))
    else:
        print(res.slice(0, args.limit).to_pandas().to_string())
        print(json.dumps({"query": args.name, "rows": res.num_rows}))


def cmd_profile(args):
    """One-pass dataset profile (``pipelines.udaf.dataset_profile``):
    exact built-ins + HLL distinct + t-digest quantiles + Misra-Gries
    top-k in a single ``Dataset.aggregate`` over one scan.
    ``profile data.parquet --numeric n_chars --string lang``."""
    _ray_init(args.num_cpus)
    import ray.data as rd

    from .pipelines.udaf import dataset_profile

    cols = {c: "numeric" for c in args.numeric or []}
    cols.update({c: "string" for c in args.string or []})
    if not cols:
        raise SystemExit("pass at least one --numeric/--string column")
    ds = rd.read_parquet(args.input, columns=sorted(cols))
    prof = dataset_profile(ds, cols, topk=args.topk,
                           quantiles=tuple(args.quantile or (0.5, 0.9)))
    out = {}
    for key, val in prof.items():
        if isinstance(val, list):  # top-k [{item, count}]
            out[key] = [{"item": e["item"], "count": int(e["count"])}
                        for e in val]
        elif isinstance(val, float):
            out[key] = round(val, 6)
        else:
            out[key] = int(val)
    print(json.dumps(out, sort_keys=True))


def cmd_index_build(args):
    """Build a persisted inverted index (stages.index) over a parquet
    corpus: distinct (term, doc) postings hive-partitioned by term
    hash; --ngram 2 builds the exact-phrase variant."""
    _ray_init(args.num_cpus)
    import ray.data as rd

    from .stages.index import build_inverted_index

    ds = rd.read_parquet(args.input, columns=[args.id_column, args.column])
    build_inverted_index(ds, args.output, text_col=args.column,
                         id_col=args.id_column, num_shards=args.shards,
                         ngram=args.ngram)
    print(json.dumps({"written": args.output, "shards": args.shards,
                      "ngram": args.ngram}))


def cmd_index_search(args):
    """Boolean term search (or exact phrase with --phrase) over a
    persisted index — reads only the query terms' shards."""
    _ray_init(args.num_cpus)
    from .stages.index import query_inverted_index, query_phrase

    # shard count / n-gram size come from the store's _meta.json
    # (explicit --shards is validated against it)
    if args.phrase:
        out = query_phrase(args.index, args.terms, id_col=args.id_column,
                           num_shards=args.shards)
    else:
        out = query_inverted_index(args.index, args.terms,
                                   id_col=args.id_column, mode=args.mode,
                                   num_shards=args.shards)
    ids = sorted(r[args.id_column] for r in out.take_all())
    print(json.dumps({"n": len(ids), "ids": ids[:args.limit]}))


def _ref_classes():
    from .sketches.bloom import BloomFilter
    from .sketches.cbloom import CountingBloomFilter
    from .sketches.cuckoo import ReferenceCuckooFilter
    from .sketches.tdbloom import TimeDecayingBloomFilter

    return {"bloom": BloomFilter, "cbloom": CountingBloomFilter,
            "tdbloom": TimeDecayingBloomFilter,
            "cuckoo": ReferenceCuckooFilter}


def cmd_import_ref(args):
    """Import a reference-engine save file into the engine's portable
    format — ``--kind bloom`` (.bf, bloom.c:525-633), ``cbloom``
    (!cbloom!, cbloom.c:854-1000), ``tdbloom`` (!tdbloo!,
    tdbloom.c:528-713 intended semantics; pass ``--timeout`` since the
    reference format does not persist it), or ``cuckoo`` (raw-struct
    dump, cuckoo.c:205-233 — SAME-ARCH only by the reference's own
    TODO; imports as a read view answering the reference's lookup
    arithmetic)."""
    cls = _ref_classes()[args.kind]
    with open(args.input, "rb") as f:
        data = f.read()
    if args.kind == "tdbloom":
        sk = cls.from_reference_bytes(data, timeout=args.timeout)
    else:
        sk = cls.from_reference_bytes(data)
    _save(sk, args.output)
    print(json.dumps({"saved": args.output, **_info_dict(sk)}))


def cmd_export_ref(args):
    """Export a Bloom / counting-Bloom / time-decaying-Bloom sketch
    file to the reference engine's on-disk layout so the C tooling can
    load it (tdbloom writes the REPAIRED header — max_time set — which
    the reference's own loader reads correctly)."""
    sk = _load(args.sketch)
    classes = _ref_classes()
    cls = classes.get(args.kind)
    if cls is None or not isinstance(sk, cls):
        print(json.dumps({"error": f"sketch is not a {args.kind}; "
                          "reference formats exist for "
                          "bloom/cbloom/tdbloom/cuckoo"}))
        sys.exit(2)
    tmp = args.output + ".tmp"
    with open(tmp, "wb") as f:
        f.write(sk.to_reference_bytes())
    os.replace(tmp, args.output)
    print(json.dumps({"saved": args.output, **_info_dict(sk)}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="archbloom-ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common_sketch_args(sp):
        sp.add_argument("--kind", default="bloom",
                        choices=["bloom", "blockedbloom", "sbloom", "cbloom",
                                 "tdbloom", "tdcbloom", "cuckoo", "qf",
                                 "cqf", "hll",
                                 "sparsehll", "slidinghll", "cms", "cucms",
                                 "tdigest",
                                 "kll", "ddsketch", "kmv", "theta",
                                 "roaring", "req", "dyndist", "gss",
                                 "varopt"])
        sp.add_argument("--expected", type=int, default=100000)
        sp.add_argument("--accuracy", type=float, default=0.01)
        sp.add_argument("--counter-width", type=int, default=8)
        sp.add_argument("--timeout", type=int, default=3600)
        sp.add_argument("--precision", type=int, default=14)
        sp.add_argument("--epsilon", type=float, default=0.001)
        sp.add_argument("--delta", type=float, default=0.01)
        sp.add_argument("--compression", type=float, default=200.0)
        sp.add_argument("--kll-k", type=int, default=200)
        sp.add_argument("--dd-alpha", type=float, default=0.01)
        sp.add_argument("--sketch-k", type=int, default=4096)
        sp.add_argument("--batch-size", type=int, default=65536)

    sp = sub.add_parser("create")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--column", default="url")
    sp.add_argument("--name", default=None)
    sp.add_argument("--secs-column", default=None,
                    help="event-time column (required for slidinghll)")
    common_sketch_args(sp)
    sp.set_defaults(fn=cmd_create)

    sp = sub.add_parser("create-static")
    sp.add_argument("input", help="parquet file")
    sp.add_argument("output")
    sp.add_argument("--kind", default="xor",
                    choices=["xor", "bfuse", "xormap"])
    sp.add_argument("--column", default="url")
    sp.add_argument("--value-column", default=None,
                    help="int value column (required for xormap)")
    sp.add_argument("--bits", type=int, default=8)
    sp.add_argument("--name", default="DEFAULT")
    sp.set_defaults(fn=cmd_create_static)

    sp = sub.add_parser("create-sharded")
    sp.add_argument("input")
    sp.add_argument("output", help="output DIRECTORY (shard states + "
                                   "manifest + shardmap.json)")
    sp.add_argument("--column", default="url")
    sp.add_argument("--kind", default="bloom",
                    choices=["bloom", "cbloom", "sbloom", "cuckoo",
                             "tdbloom", "tdcbloom", "qf", "cqf"])
    sp.add_argument("--num-shards", type=int, default=32)
    sp.add_argument("--secs-column", default=None,
                    help="tdbloom/tdcbloom: int64-seconds or timestamp "
                         "column carrying each key's event time")
    sp.add_argument("--timeout", type=int, default=3600,
                    help="tdbloom/tdcbloom: freshness window in the "
                         "secs column's units")
    sp.add_argument("--counter-width", type=int, default=8,
                    help="cbloom/tdcbloom: counter bits (4/8/16/32/64; "
                         "tdcbloom excludes 4)")
    sp.add_argument("--expected", type=int, default=100000,
                    help="total expected keys (per-shard sizing is "
                         "derived; sbloom uses it only as a seed)")
    sp.add_argument("--accuracy", type=float, default=0.01)
    sp.add_argument("--batch-size", type=int, default=65536)
    sp.set_defaults(fn=cmd_create_sharded)

    sp = sub.add_parser("query-sharded")
    sp.add_argument("dir", help="create-sharded output directory")
    sp.add_argument("element")
    sp.add_argument("--at", type=int, default=None,
                    help="tdbloom: probe time in the secs column's "
                         "units (default: newest ingested).  Must be "
                         ">= the newest ingested time — the filter is "
                         "the END-of-ingest state, and probing the "
                         "past against later slot writes reads stale "
                         "(reference tick-wrap semantics)")
    sp.set_defaults(fn=cmd_query_sharded)

    sp = sub.add_parser("merge-sharded")
    sp.add_argument("a", help="sharded directory (base)")
    sp.add_argument("b", help="sharded directory (increment)")
    sp.add_argument("output", help="merged output directory")
    sp.set_defaults(fn=cmd_merge_sharded)

    sp = sub.add_parser("add")
    sp.add_argument("sketch")
    sp.add_argument("input")
    sp.add_argument("--column", default="url")
    sp.add_argument("--batch-size", type=int, default=65536)
    sp.set_defaults(fn=cmd_add)

    sp = sub.add_parser("query")
    sp.add_argument("sketch")
    sp.add_argument("element")
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("info")
    sp.add_argument("sketch")
    sp.set_defaults(fn=cmd_info)

    sp = sub.add_parser("rename")
    sp.add_argument("sketch")
    sp.add_argument("name")
    sp.set_defaults(fn=cmd_rename)

    sp = sub.add_parser("merge")
    sp.add_argument("a")
    sp.add_argument("b")
    sp.add_argument("output")
    sp.set_defaults(fn=cmd_merge)

    sp = sub.add_parser("intersect")
    sp.add_argument("a")
    sp.add_argument("b")
    sp.add_argument("output")
    sp.set_defaults(fn=cmd_intersect)

    sp = sub.add_parser("probe")
    sp.add_argument("sketch")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--column", default="url")
    sp.add_argument("--concurrency", type=int, default=4)
    sp.add_argument("--at", type=int, default=None,
                    help="tdbloom dirs: probe time (see query-sharded)")
    sp.set_defaults(fn=cmd_probe)

    sp = sub.add_parser("import-ref")
    sp.add_argument("input", help="reference-engine save file")
    sp.add_argument("output", help="engine sketch file")
    sp.add_argument("--kind", default="bloom",
                    choices=["bloom", "cbloom", "tdbloom", "cuckoo"])
    sp.add_argument("--timeout", type=int, default=None,
                    help="tdbloom timeout (not persisted by the "
                         "reference format; default max_time-1)")
    sp.set_defaults(fn=cmd_import_ref)

    sp = sub.add_parser("export-ref")
    sp.add_argument("sketch", help="engine sketch file")
    sp.add_argument("output", help="reference-engine save file")
    sp.add_argument("--kind", default="bloom",
                    choices=["bloom", "cbloom", "tdbloom", "cuckoo"])
    sp.set_defaults(fn=cmd_export_ref)

    sp = sub.add_parser("index-build")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--column", default="text")
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--shards", type=int, default=32)
    sp.add_argument("--ngram", type=int, default=1)
    sp.set_defaults(fn=cmd_index_build)

    sp = sub.add_parser("index-search")
    sp.add_argument("index")
    sp.add_argument("terms", nargs="+")
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--mode", default="and", choices=["and", "or"])
    sp.add_argument("--phrase", action="store_true")
    sp.add_argument("--shards", type=int, default=None,
                    help="validated against the index _meta.json")
    sp.add_argument("--limit", type=int, default=100)
    sp.set_defaults(fn=cmd_index_search)

    sp = sub.add_parser("transform")
    sp.add_argument("input", help="parquet file or directory of shards")
    sp.add_argument("output", help="output directory (per-shard, resumable)")
    sp.add_argument("--column", default="text")
    sp.add_argument("--ops", default="quality,fingerprint",
                    help="comma list of quality,fingerprint,langid")
    sp.add_argument("--batch-size", type=int, default=65536)
    sp.set_defaults(fn=cmd_transform)

    sp = sub.add_parser("profile")
    sp.add_argument("input")
    sp.add_argument("--numeric", action="append", default=None,
                    help="numeric column (repeatable)")
    sp.add_argument("--string", action="append", default=None,
                    help="string column (repeatable)")
    sp.add_argument("--topk", type=int, default=5)
    sp.add_argument("--quantile", type=float, action="append",
                    default=None, help="repeatable; default 0.5 and 0.9")
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser("run")
    sp.add_argument("name", help="queries() pipeline name, or 'list'")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--out", default=None, help="write result parquet here")
    sp.add_argument("--limit", type=int, default=20,
                    help="rows to print when --out is not given")
    sp.add_argument("--stats", action="store_true",
                    help="print per-operator execution stats (wall "
                         "time, rows, bytes per stage) to stderr when "
                         "the pipeline returns a Dataset")
    sp.set_defaults(fn=cmd_run)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
