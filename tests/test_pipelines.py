"""E2E Ray Data pipeline tests: read → update → tree merge → query.

Mirrors the reference's CLI lifecycle (``bloomtool create`` then
``bloomtool query``, reference bin/bloomtool.c:20-105) as a distributed
pipeline over real parquet input.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archbloom_ray.sketches import BloomFilter
from archbloom_ray.pipelines import (
    build_sketch,
    build_sketches,
    build_grouped_sketches,
    grouped_to_dict,
    membership,
)

from conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(DOCS, columns=["doc_id", "text", "lang"])


def _local_oracle_bloom(expected):
    texts = pq.read_table(DOCS, columns=["text"])["text"]
    bf = BloomFilter(expected, 0.01)
    bf.update_arrow(texts)
    return bf, texts


class TestBuild:
    def test_distributed_equals_local(self, ray_session, docs_ds):
        """Distributed tree-merged build == single-pass local build."""
        n = docs_ds.count()
        sk = build_sketch(
            docs_ds, "text", lambda: BloomFilter(n, 0.01), batch_size=64
        )
        local, texts = _local_oracle_bloom(n)
        assert np.array_equal(sk.bitmap, local.bitmap)
        assert sk.lookup_batch(texts).all()

    def test_multi_sketch_single_pass(self, ray_session, docs_ds):
        out = build_sketches(
            docs_ds,
            {
                "bloom_small": ("text", lambda: BloomFilter(500, 0.01)),
                "bloom_big": ("text", lambda: BloomFilter(5000, 0.001)),
            },
            batch_size=128,
        )
        assert set(out) == {"bloom_small", "bloom_big"}
        texts = pq.read_table(DOCS, columns=["text"])["text"]
        assert out["bloom_small"].lookup_batch(texts).all()
        assert out["bloom_big"].lookup_batch(texts).all()

    def test_grouped_build(self, ray_session, docs_ds):
        grouped = build_grouped_sketches(
            docs_ds, "lang", "text", lambda: BloomFilter(500, 0.01), batch_size=64
        )
        sketches = grouped_to_dict(grouped)
        tbl = pq.read_table(DOCS, columns=["text", "lang"])
        langs = set(tbl["lang"].to_pylist())
        assert set(sketches) == langs
        # per-lang: every text of that lang present in that lang's sketch
        for lang in langs:
            mask = pa.compute.equal(tbl["lang"], lang)
            texts = tbl.filter(mask)["text"]
            assert sketches[lang].lookup_batch(texts).all(), lang

    def test_grouped_build_salted_equals_unsalted(self, ray_session, docs_ds):
        a = grouped_to_dict(
            build_grouped_sketches(
                docs_ds, "lang", "text", lambda: BloomFilter(500, 0.01), batch_size=64
            )
        )
        b = grouped_to_dict(
            build_grouped_sketches(
                docs_ds,
                "lang",
                "text",
                lambda: BloomFilter(500, 0.01),
                batch_size=64,
                salt=4,
            )
        )
        assert set(a) == set(b)
        for k in a:
            assert np.array_equal(a[k].bitmap, b[k].bitmap), k


class TestQuery:
    def test_membership_probe(self, ray_session, docs_ds):
        n = docs_ds.count()
        sk = build_sketch(docs_ds, "text", lambda: BloomFilter(n, 0.01))
        probed = membership(docs_ds, sk, "text", concurrency=2).take_all()
        assert all(r["present"] for r in probed)

    def test_membership_absent(self, ray_session):
        import ray.data

        sk = BloomFilter(1000, 0.001)
        sk.update_arrow(pa.array([f"in-{i}" for i in range(1000)]))
        probe = ray.data.from_arrow(
            pa.table({"key": [f"out-{i}" for i in range(5000)]})
        )
        out = membership(probe, sk, "key", concurrency=2).take_all()
        fpr = sum(r["present"] for r in out) / len(out)
        assert fpr < 0.01  # design p=0.001, generous slack


class TestEventTimeBuild:
    def test_distributed_equals_sequential(self, ray_session):
        """Slot-max merge under the event-time clock must equal a
        single-process build with the same (key, ts) stream
        (SURVEY.md §7: associative substitute for last-writer-wins)."""
        import ray.data
        from archbloom_ray.pipelines.build import build_event_time_sketch
        from archbloom_ray.sketches import TimeDecayingBloomFilter

        n = 4000
        keys = [f"k{i % 1300}" for i in range(n)]
        ts = [1_700_000_000 + (i * 7) % 5000 for i in range(n)]
        tbl = pa.table({"key": pa.array(keys, type=pa.string()),
                        "ts": pa.array([t * 1_000_000 for t in ts],
                                       type=pa.timestamp("us"))})
        ds = ray.data.from_arrow(tbl).repartition(6)
        factory = lambda: TimeDecayingBloomFilter(  # noqa: E731
            1300, 0.01, timeout=400, start_time=1_700_000_000)
        got = build_event_time_sketch(ds, "key", "ts", factory, batch_size=512)

        ref = factory()
        ref.update_arrow(pa.array(keys, type=pa.string()),
                         now=np.array(ts, dtype=np.int64))
        assert np.array_equal(got.filter, ref.filter)
        now = max(ts)
        probe = pa.array([f"k{i}" for i in range(1300)], type=pa.string())
        assert np.array_equal(got.lookup_batch(probe, now=now),
                              ref.lookup_batch(probe, now=now))


class TestUnionHarmonized:
    def test_null_fill_and_promotion(self, ray_session):
        """Missing columns in BOTH directions null-fill; int32+int64 →
        int64; int64+float64 → float64; branches already on the target
        schema pass through un-fitted."""
        import ray.data as rd

        from archbloom_ray.sources import union_harmonized

        a = rd.from_arrow(pa.table({
            "id": pa.array([1, 2], pa.int32()),
            "x": pa.array([1.5, 2.5], pa.float64()),
        }))
        b = rd.from_arrow(pa.table({
            "id": pa.array([3, 4], pa.int64()),
            "y": pa.array(["p", "q"], pa.string()),
        }))
        u = union_harmonized([a, b])
        t = pa.Table.from_pylist(u.take_all())
        got = sorted(t.to_pylist(), key=lambda r: r["id"])
        assert got == [
            {"id": 1, "x": 1.5, "y": None},
            {"id": 2, "x": 2.5, "y": None},
            {"id": 3, "x": None, "y": "p"},
            {"id": 4, "x": None, "y": "q"},
        ]

    def test_int_float_promotion(self, ray_session):
        import ray.data as rd

        from archbloom_ray.sources import union_harmonized

        a = rd.from_arrow(pa.table({"v": pa.array([1, 2], pa.int64())}))
        b = rd.from_arrow(pa.table({"v": pa.array([0.5], pa.float64())}))
        u = union_harmonized([a, b])
        vals = sorted(r["v"] for r in u.take_all())
        assert vals == [0.5, 1.0, 2.0]
        assert all(isinstance(v, float) for v in vals)


class TestSources:
    def test_jsonl_csv_lines_roundtrip(self, ray_session, tmp_path):
        import json

        from archbloom_ray.sources import read_csv, read_jsonl, read_lines

        rows = [{"id": i, "name": f"n{i}", "extra": i * 2} for i in range(50)]
        jp = tmp_path / "d.jsonl"
        jp.write_text("\n".join(json.dumps(r) for r in rows))
        cp = tmp_path / "d.csv"
        cp.write_text("id,name,extra\n" + "\n".join(
            f"{r['id']},{r['name']},{r['extra']}" for r in rows))
        lp = tmp_path / "d.txt"
        lp.write_text("\n".join(r["name"] for r in rows) + "\n")

        j = read_jsonl(str(jp), columns=["id", "name"])
        assert sorted(j.schema().names) == ["id", "name"]
        assert sorted(r["id"] for r in j.take_all()) == list(range(50))

        c = read_csv(str(cp), columns=["id", "name"])
        assert sorted(c.schema().names) == ["id", "name"]
        assert sorted(r["name"] for r in c.take_all()) == sorted(
            r["name"] for r in rows)

        l = read_lines(str(lp), column="element")
        assert l.schema().names == ["element"]
        assert sorted(r["element"] for r in l.take_all()) == sorted(
            r["name"] for r in rows)

    def test_gzip_jsonl_and_lines(self, ray_session, tmp_path):
        import gzip
        import json

        from archbloom_ray.sources import read_jsonl_gz, read_lines_gz

        jp = tmp_path / "d.jsonl.gz"
        with gzip.open(jp, "wt") as f:
            for i in range(20):
                f.write(json.dumps({"id": i, "name": f"n{i}", "x": i * 2}) + "\n")
        lp = tmp_path / "d.txt.gz"
        with gzip.open(lp, "wt") as f:
            f.write("alpha\nbeta\ngamma\n")

        j = read_jsonl_gz(str(jp), columns=["id", "name"])
        assert sorted(r["id"] for r in j.take_all()) == list(range(20))
        l = read_lines_gz(str(lp), column="element")
        assert sorted(r["element"] for r in l.take_all()) == [
            "alpha", "beta", "gamma"]

    def test_zstd_and_bz2_jsonl(self, ray_session, tmp_path):
        import bz2
        import json

        import pyarrow as pa

        from archbloom_ray.sources import (
            read_jsonl_bz2,
            read_jsonl_zst,
            read_lines_compressed,
        )

        payload = "".join(json.dumps({"id": i, "v": i * 3}) + "\n"
                          for i in range(25)).encode()
        zp = tmp_path / "d.jsonl.zst"
        with pa.output_stream(str(zp), compression="zstd") as f:
            f.write(payload)
        bp = tmp_path / "d.jsonl.bz2"
        bp.write_bytes(bz2.compress(payload))

        z = read_jsonl_zst(str(zp), columns=["id"])
        assert sorted(r["id"] for r in z.take_all()) == list(range(25))
        b = read_jsonl_bz2(str(bp))
        assert sorted(r["v"] for r in b.take_all()) == [i * 3 for i in range(25)]

        lp = tmp_path / "d.txt.zst"
        with pa.output_stream(str(lp), compression="zstd") as f:
            f.write(b"alpha\nbeta\n")
        l = read_lines_compressed(str(lp), "zstd", column="w")
        assert sorted(r["w"] for r in l.take_all()) == ["alpha", "beta"]

    def test_warc_reader(self, ray_session, tmp_path):
        import gzip

        from archbloom_ray.sources import read_warc

        def rec(rtype, uri, body, rid):
            h = (f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
                 + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
                 + "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                 + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
                 + f"Content-Length: {len(body)}\r\n\r\n").encode()
            return h + body + b"\r\n\r\n"

        data = (rec("warcinfo", None, b"software: t", "w0")
                + rec("response", "http://a.example/", b"<html>alpha</html>", "r1")
                + rec("request", "http://a.example/", b"GET / HTTP/1.1", "q1")
                + rec("response", "http://b.example/", b"\x00\x01bin\xff", "r2"))
        (tmp_path / "one.warc").write_bytes(data)
        with gzip.open(tmp_path / "two.warc.gz", "wb") as f:
            f.write(rec("response", "http://c.example/", b"gz body", "r3"))

        rows = sorted(read_warc(str(tmp_path / "one.warc")).take_all(),
                      key=lambda r: r["target_uri"])
        assert [(r["warc_type"], r["target_uri"], r["payload"]) for r in rows] == [
            ("response", "http://a.example/", b"<html>alpha</html>"),
            ("response", "http://b.example/", b"\x00\x01bin\xff")]
        assert sorted(
            r["warc_type"] for r in
            read_warc(str(tmp_path / "one.warc"), include_types=None).take_all()
        ) == ["request", "response", "response", "warcinfo"]
        gz = read_warc(str(tmp_path / "two.warc.gz"), gzipped=True).take_all()
        assert [(r["target_uri"], r["payload"]) for r in gz] == [
            ("http://c.example/", b"gz body")]


class TestHistogramAndWeightedSample:
    def test_histogram_int_exact(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import histogram_int

        rng = np.random.default_rng(3)
        xs = rng.integers(0, 100, size=5000)
        ds = rd.from_arrow(pa.table({"x": pa.array(xs, type=pa.int64())}))
        got = {r["bucket"]: r["n"] for r in
               histogram_int(ds, "x", 0, 100, 10).take_all()}
        import collections

        expect = collections.Counter(min(int(x) * 10 // 100, 9) for x in xs)
        assert got == dict(expect)

    def test_bloom_antijoin_exact(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import bloom_antijoin

        rng = np.random.default_rng(11)
        fact_keys = [f"k{i:04d}" for i in range(2000)]
        dim_keys = [f"k{i:04d}" for i in rng.choice(2000, 700, replace=False)]
        fact = rd.from_arrow(pa.table({"fk": fact_keys,
                                       "v": list(range(2000))}))
        dim = rd.from_arrow(pa.table({"dk": dim_keys}))
        # high fpr forces real Bloom false positives; the exact re-check
        # must rescue every one of them
        out = bloom_antijoin(fact, "fk", dim, "dk", fpr=0.2).take_all()
        got = sorted(r["fk"] for r in out)
        expect = sorted(set(fact_keys) - set(dim_keys))
        assert got == expect
        # conservative mode: never KEEPS a dim member, may over-drop
        approx = bloom_antijoin(fact, "fk", dim, "dk", fpr=0.2,
                                exact=False).take_all()
        akeys = {r["fk"] for r in approx}
        assert akeys <= set(expect)
        assert not (akeys & set(dim_keys))

    def test_bloom_antijoin_int_keys_empty_dim(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import bloom_antijoin

        fact = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
        dim = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
        out = bloom_antijoin(fact, "k", dim, "k").take_all()
        assert sorted(r["k"] for r in out) == [1, 2, 3]

    def test_grouped_mode_matches_counter(self, ray_session):
        import collections

        import ray.data as rd

        from archbloom_ray.pipelines.relational import grouped_mode

        rng = np.random.default_rng(5)
        keys = rng.choice(["a", "b", "c"], 4000).tolist()
        vals = rng.choice([f"v{i}" for i in range(7)], 4000).tolist()
        ds = rd.from_arrow(pa.table({"g": keys, "x": vals})).repartition(9)
        out = {r["g"]: (r["mode"], r["n"]) for r in
               grouped_mode(ds, ["g"], "x").take_all()}
        for g in "abc":
            c = collections.Counter(v for k, v in zip(keys, vals) if k == g)
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            assert out[g] == best

    def test_running_window_matches_reference(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import running_window

        rng = np.random.default_rng(9)
        n = 3000
        keys = rng.integers(0, 40, n)
        ts = rng.integers(0, 10_000, n) * 1_000_000  # µs, WITH ties
        ids = np.arange(n)
        vals = rng.integers(-5, 50, n)
        tbl = pa.table({
            "id": pa.array(ids, pa.int64()),
            "k": pa.array(keys, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "v": pa.array(vals, pa.int64()),
        })
        out = {r["id"]: (r["gap_us"], r["cum"]) for r in running_window(
            rd.from_arrow(tbl).repartition(7), "k", "ts", "v", "id",
            out_sum="cum").take_all()}
        assert len(out) == n
        # scalar reference: per key, order by (ts, id)
        import collections

        by_key = collections.defaultdict(list)
        for i in range(n):
            by_key[keys[i]].append((ts[i], ids[i], vals[i]))
        for k, rows in by_key.items():
            rows.sort()
            cum, prev_ts = 0, None
            for t, i, v in rows:
                cum += v
                gap = 0 if prev_ts is None else t - prev_ts
                prev_ts = t
                assert out[i] == (gap, cum), (k, i)

    def test_weighted_sample_properties(self, ray_session):
        import ray.data as rd

        from archbloom_ray.stages import weighted_sample

        n = 2000
        w = np.ones(n)
        heavy = [7, 123, 999]
        w[heavy] = 1e6   # ~overwhelming weight: must all be sampled
        tbl = pa.table({"id": pa.array([f"r{i:05d}" for i in range(n)]),
                        "w": pa.array(w)})
        out = weighted_sample(rd.from_arrow(tbl), "id", "w", k=20).take_all()
        ids = [r["id"] for r in out]
        assert len(ids) == 20 and len(set(ids)) == 20
        for h in heavy:
            assert f"r{h:05d}" in ids
        # determinism + partitioning invariance
        again = weighted_sample(
            rd.from_arrow(tbl).repartition(17), "id", "w", k=20).take_all()
        assert sorted(ids) == sorted(r["id"] for r in again)

    def test_broadcast_range_count(self, ray_session):
        """Overlapping, non-aligned [lo, hi) windows over a fact stream:
        per-window counts match a brute-force check, boundaries are
        half-open, and a row inside k windows counts in all k."""
        import ray
        import ray.data as rd

        from archbloom_ray.pipelines import broadcast_range_count

        rng = np.random.default_rng(7)
        ts_us = np.sort(rng.integers(0, 10_000, size=5000)).astype("datetime64[us]")
        facts = rd.from_arrow(pa.table({"ts": pa.array(ts_us)})).repartition(8)
        lo = np.array([0, 50, 5000, 9_999, 20_000], dtype=np.int64)
        hi = np.array([100, 150, 9_000, 10_000, 30_000], dtype=np.int64)
        intervals = pa.table({
            "interval_id": pa.array(np.arange(5, dtype=np.int64)),
            "lo": pa.array(lo), "hi": pa.array(hi),
        })
        out = {r["interval_id"]: r["n_events"]
               for r in broadcast_range_count(
                   facts, "ts", ray.put(intervals)).take_all()}
        raw = ts_us.astype("int64")
        for i in range(5):
            expect = int(((raw >= lo[i]) & (raw < hi[i])).sum())
            assert out.get(i, 0) == expect, (i, out.get(i, 0), expect)
        assert 4 not in out  # empty window absent from output

    def test_partitioned_range_count_parity(self, ray_session):
        """Large-large variant == broadcast variant == brute force,
        with a bucket width SMALLER than the intervals (forces
        multi-bucket replication + per-bucket clipping, the
        double-count hazard)."""
        import ray.data as rd

        from archbloom_ray.pipelines import partitioned_range_count

        rng = np.random.default_rng(11)
        raw = np.sort(rng.integers(0, 10_000, size=5000)).astype(np.int64)
        facts = rd.from_arrow(pa.table({"ts": pa.array(raw)})).repartition(8)
        lo = np.array([0, 50, 5000, 9_999, 20_000, 700], dtype=np.int64)
        hi = np.array([100, 150, 9_000, 10_000, 30_000, 701], dtype=np.int64)
        intervals = rd.from_arrow(pa.table({
            "interval_id": pa.array(np.arange(6, dtype=np.int64)),
            "lo": pa.array(lo), "hi": pa.array(hi),
        })).repartition(3)
        out = {r["interval_id"]: r["n_events"]
               for r in partitioned_range_count(
                   facts, intervals, "ts", bucket_width=128).take_all()}
        for i in range(6):
            expect = int(((raw >= lo[i]) & (raw < hi[i])).sum())
            assert out.get(i, 0) == expect, (i, out.get(i, 0), expect)
        assert 4 not in out  # empty window absent

    def test_partitioned_range_count_timestamp_facts(self, ray_session):
        """Timestamp fact columns cast like the broadcast variant."""
        import ray.data as rd

        from archbloom_ray.pipelines import partitioned_range_count

        ts_us = np.arange(0, 1000, 7).astype("datetime64[us]")
        facts = rd.from_arrow(pa.table({"ts": pa.array(ts_us)}))
        intervals = rd.from_arrow(pa.table({
            "interval_id": pa.array([0], type=pa.int64()),
            "lo": pa.array([100], type=pa.int64()),
            "hi": pa.array([200], type=pa.int64()),
        }))
        out = partitioned_range_count(
            facts, intervals, "ts", bucket_width=64).take_all()
        raw = ts_us.astype("int64")
        assert out[0]["n_events"] == int(((raw >= 100) & (raw < 200)).sum())

    def test_grouped_trimmed_stats(self, ray_session):
        """Trimmed sum == brute-force sorted-slice, incl. heavy ties
        straddling the trim boundaries, invariant to partitioning."""
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_trimmed_stats

        rng = np.random.default_rng(9)
        keys = rng.choice(["a", "b"], size=2000)
        vals = rng.integers(0, 20, size=2000)  # few distinct -> tie-heavy
        ds = rd.from_arrow(pa.table({
            "k": pa.array(keys), "v": pa.array(vals.astype(np.int64)),
        })).repartition(7)
        out = {r["k"]: (r["n_kept"], r["trimmed_sum"])
               for r in grouped_trimmed_stats(ds, ["k"], "v").take_all()}
        for k in ("a", "b"):
            s = np.sort(vals[keys == k])
            n = s.size
            lo = n // 10
            kept = s[lo: n - lo]
            assert out[k] == (kept.size, int(kept.sum())), k

    def test_topk_rows_no_global_sort(self, ray_session):
        """topk_rows == ORDER BY ... LIMIT k, mixed directions, ties
        broken by the key list, partitioning-invariant."""
        import ray.data as rd

        import pyarrow.compute as pc

        from archbloom_ray.pipelines import topk_rows

        rng = np.random.default_rng(5)
        n = rng.integers(0, 50, size=3000)
        ids = np.arange(3000, dtype=np.int64)
        tbl = pa.table({"id": pa.array(ids), "n": pa.array(n)})
        want = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("n", "descending"), ("id", "ascending")]
        ).slice(0, 25)).to_pylist()
        for parts in (1, 7):
            got = topk_rows(
                rd.from_arrow(tbl).repartition(parts),
                [("n", "descending"), ("id", "ascending")], 25).to_pylist()
            assert got == want

    def test_grouped_topk(self, ray_session):
        """grouped_topk == brute-force pandas row_number(count desc,
        value asc) <= k, invariant to input partitioning."""
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_topk

        rng = np.random.default_rng(3)
        keys = rng.choice(["a", "b", "c"], size=4000)
        vals = rng.integers(0, 40, size=4000)
        tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals.astype(np.int64))})

        import collections
        expect = {}
        for kk in "abc":
            cnt = collections.Counter(vals[keys == kk].tolist())
            top = sorted(cnt.items(), key=lambda iv: (-iv[1], iv[0]))[:4]
            expect[kk] = [(v, c, i + 1) for i, (v, c) in enumerate(top)]

        for parts in (1, 13):
            out = grouped_topk(rd.from_arrow(tbl).repartition(parts),
                               ["k"], "v", 4).take_all()
            got = {}
            for r in sorted(out, key=lambda r: (r["k"], r["rank"])):
                got.setdefault(r["k"], []).append((r["v"], r["n"], r["rank"]))
            assert got == expect, parts

    def test_grouped_rollup(self, ray_session):
        """All rollup levels match brute-force pandas; non-decomposable
        kinds are rejected."""
        import pandas as pd
        import pytest
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_rollup

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "a": rng.choice(["x", "y"], 3000),
            "b": rng.choice(["p", "q", "r"], 3000),
            "v": rng.integers(0, 100, 3000).astype(np.int64),
        })
        out = grouped_rollup(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(7),
            ["a", "b"],
            [("n", None, "count"), ("s", "v", "sum"), ("mx", "v", "max")],
        ).take_all()
        got = {(r["a"], r["b"]): (r["n"], r["s"], r["mx"]) for r in out}
        fine = df.groupby(["a", "b"])["v"].agg(["count", "sum", "max"])
        for (a, b), row in fine.iterrows():
            assert got[(a, b)] == (row["count"], row["sum"], row["max"])
        lvl1 = df.groupby("a")["v"].agg(["count", "sum", "max"])
        for a, row in lvl1.iterrows():
            assert got[(a, "ALL")] == (row["count"], row["sum"], row["max"])
        assert got[("ALL", "ALL")] == (len(df), df["v"].sum(), df["v"].max())
        assert len(got) == len(fine) + len(lvl1) + 1

        with pytest.raises(ValueError):
            grouped_rollup(rd.from_arrow(pa.Table.from_pandas(df)),
                           ["a"], [("m", "v", "mean")])

    def test_key_set_op(self, ray_session):
        """intersect/except/union(distinct) match Python set algebra,
        invariant to duplicates and partitioning."""
        import pytest
        import ray.data as rd

        from archbloom_ray.pipelines import key_set_op

        rng = np.random.default_rng(5)
        a = rng.integers(0, 60, size=1000)
        b = rng.integers(40, 100, size=1000)
        la = rd.from_arrow(pa.table({"k": pa.array(a.astype(np.int64))})).repartition(5)
        lb = rd.from_arrow(pa.table({"k": pa.array(b.astype(np.int64))})).repartition(3)
        sa, sb = set(a.tolist()), set(b.tolist())
        for op, expect in (("intersect", sa & sb), ("except", sa - sb),
                           ("union", sa | sb)):
            got = {r["k"] for r in key_set_op(la, lb, "k", op).take_all()}
            assert got == expect, op
        with pytest.raises(ValueError):
            key_set_op(la, lb, "k", "xor")

    def test_grouped_min_k(self, ray_session):
        """Per-key smallest-k by composite order == brute-force pandas
        row_number; all input columns ride through; partition-invariant."""
        import pandas as pd
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_min_k

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c", "d"], 2000),
            "o1": rng.integers(0, 50, 2000).astype(np.int64),
            "o2": rng.integers(0, 1_000_000, 2000).astype(np.int64),
            "payload": rng.integers(0, 10, 2000).astype(np.int64),
        })
        expect = (df.sort_values(["g", "o1", "o2"])
                  .groupby("g").head(3).reset_index(drop=True))
        for parts in (1, 9):
            out = grouped_min_k(
                rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                ["g"], ["o1", "o2"], 3).take_all()
            got = sorted(((r["g"], r["o1"], r["o2"], r["payload"], r["rank"])
                          for r in out))
            want = sorted(
                (g, o1, o2, p, i + 1)
                for g, grp in expect.groupby("g")
                for i, (o1, o2, p) in enumerate(
                    zip(grp["o1"], grp["o2"], grp["payload"])))
            assert got == want, parts

    def test_asof_join_partitioned_parity(self, ray_session):
        """Partitioned (large-large) as-of join returns exactly what the
        broadcast variant returns on the same deduped input."""
        import ray.data as rd

        from archbloom_ray.pipelines import asof_join_partitioned
        from archbloom_ray.pipelines.relational import asof_join_broadcast

        rng = np.random.default_rng(13)
        nl, nr = 3000, 400
        lk = rng.integers(0, 50, nl).astype(np.int64)
        lts = rng.integers(0, 10**11, nl).astype("datetime64[us]")
        left_tbl = pa.table({
            "lid": pa.array(np.arange(nl, dtype=np.int64)),
            "k": pa.array(lk), "ts": pa.array(lts),
        })
        # right rows unique at SECOND granularity (the operators' ts
        # resolution) → deterministic matches
        rk = rng.integers(0, 60, nr).astype(np.int64)
        rts = (rng.choice(100_000, size=nr, replace=False).astype(np.int64)
               * 1_000_000).astype("datetime64[us]")
        right_tbl = pa.table({
            "k": pa.array(rk), "rts": pa.array(rts),
            "val": pa.array([f"v{i}" for i in range(nr)]),
        })
        part = asof_join_partitioned(
            rd.from_arrow(left_tbl).repartition(7),
            rd.from_arrow(right_tbl).repartition(3),
            left_key="k", right_key="k", left_ts="ts", right_ts="rts",
            value_columns=["val"],
        ).take_all()
        bcast = asof_join_broadcast(
            rd.from_arrow(left_tbl), right_tbl,
            left_key="k", right_key="k", left_ts="ts", right_ts="rts",
            value_columns=["val"],
        ).take_all()
        got = {r["lid"]: r["val"] for r in part}
        want = {r["lid"]: r["val"] for r in bcast}
        assert len(got) == nl
        assert got == want
        assert any(v is None for v in want.values())  # unmatched present
        assert any(v is not None for v in want.values())

    def test_grouped_moments(self, ray_session):
        """Moments match exact numpy integer sums; derived correlation
        matches numpy corrcoef."""
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_moments

        rng = np.random.default_rng(17)
        g = rng.choice(["a", "b"], 5000)
        x = rng.integers(-100, 100, 5000).astype(np.int64)
        y = (3 * x + rng.integers(-50, 50, 5000)).astype(np.int64)
        ds = rd.from_arrow(pa.table({"g": pa.array(g), "x": pa.array(x),
                                     "y": pa.array(y)})).repartition(6)
        out = {r["g"]: r for r in grouped_moments(ds, ["g"], "x", "y").take_all()}
        for kk in ("a", "b"):
            m = g == kk
            r = out[kk]
            assert (r["n"], r["sum_x"], r["sum_y"]) == (m.sum(), x[m].sum(), y[m].sum())
            assert (r["sum_xx"], r["sum_yy"], r["sum_xy"]) == (
                (x[m] ** 2).sum(), (y[m] ** 2).sum(), (x[m] * y[m]).sum())
            n = r["n"]
            cov = r["sum_xy"] / n - (r["sum_x"] / n) * (r["sum_y"] / n)
            vx = r["sum_xx"] / n - (r["sum_x"] / n) ** 2
            vy = r["sum_yy"] / n - (r["sum_y"] / n) ** 2
            corr = cov / np.sqrt(vx * vy)
            assert abs(corr - np.corrcoef(x[m], y[m])[0, 1]) < 1e-9


class TestGroupedNtile:
    def _oracle(self, rows, k):
        import duckdb
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, v BIGINT, rid BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        return sorted(map(tuple, con.execute(f"""
            WITH w AS (SELECT g, v, ntile({k}) OVER
                       (PARTITION BY g ORDER BY v, rid) AS tile FROM t)
            SELECT g, tile, count(*), min(v), max(v), CAST(sum(v) AS BIGINT)
            FROM w GROUP BY g, tile""").fetchall()))

    def _run(self, rows, k):
        import ray.data as rd
        from archbloom_ray.pipelines.relational import grouped_ntile_stats

        ds = rd.from_items([{"g": g, "v": v, "rid": r} for g, v, r in rows])
        out = grouped_ntile_stats(ds, ["g"], "v", k)
        return sorted((r["g"], r["tile"], r["n_rows"], r["min_val"],
                       r["max_val"], r["sum_val"]) for r in out.take_all())

    def test_heavy_ties_matches_duckdb(self, ray_session):
        rng = np.random.default_rng(7)
        rows = [(g, int(v), i)
                for i, (g, v) in enumerate(zip(
                    rng.choice(["a", "b", "c"], 500),
                    rng.integers(0, 9, 500)))]   # 9 distinct values → ties straddle tiles
        for k in (1, 3, 4, 7):
            assert self._run(rows, k) == self._oracle(rows, k), k

    def test_fewer_rows_than_tiles(self, ray_session):
        rows = [("a", 5, 0), ("a", 3, 1), ("b", 1, 2)]
        assert self._run(rows, 4) == self._oracle(rows, 4)


class TestGroupedStringAgg:
    def test_matches_duckdb_and_dedups(self, ray_session):
        """Ordered DISTINCT concatenation == DuckDB string_agg(DISTINCT
        ... ORDER BY ...), invariant to duplicates and partitioning."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_string_agg

        rng = np.random.default_rng(11)
        rows = [(g, f"s{v:02d}")
                for g, v in zip(rng.choice(["a", "b", "c"], 800),
                                rng.integers(0, 40, 800))]
        ds = rd.from_items(
            [{"g": g, "v": v} for g, v in rows]).repartition(6)
        got = sorted((r["g"], r["n_distinct"], r["agg"])
                     for r in grouped_string_agg(ds, ["g"], "v").take_all())

        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, v VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            SELECT g, CAST(count(DISTINCT v) AS BIGINT),
                   string_agg(DISTINCT v, ',' ORDER BY v)
            FROM t GROUP BY g""").fetchall()))
        assert got == want


class TestUnpivot:
    def test_matches_pandas_melt(self, ray_session):
        """Wide→long reshape == pandas melt (as multisets), invariant to
        partitioning; empty value_cols raises."""
        import pandas as pd
        import pytest
        import ray.data as rd

        from archbloom_ray.pipelines import unpivot

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "id": np.arange(200, dtype=np.int64),
            "a": rng.integers(0, 50, 200).astype(np.int64),
            "b": rng.integers(0, 50, 200).astype(np.int64),
        })
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
        out = unpivot(ds, ["id"], ["a", "b"]).take_all()
        got = sorted((r["id"], r["name"], r["value"]) for r in out)
        want = sorted(map(tuple, df.melt(
            id_vars=["id"], value_vars=["a", "b"],
            var_name="name", value_name="value").itertuples(index=False)))
        assert got == want
        with pytest.raises(ValueError):
            unpivot(ds, ["id"], [])


class TestFunnelUsers:
    def _oracle(self, rows, w_us):
        import duckdb
        con = duckdb.connect()
        con.execute("CREATE TABLE t (u BIGINT, ts BIGINT, typ VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        return sorted(map(tuple, con.execute(f"""
            WITH ab AS (SELECT * FROM t WHERE typ IN ('A', 'B')),
            conv AS (
                SELECT DISTINCT a.u FROM ab a JOIN ab b USING (u)
                WHERE a.typ = 'A' AND b.typ = 'B'
                  AND b.ts > a.ts AND b.ts <= a.ts + {w_us})
            SELECT u, CAST(count(*) FILTER (WHERE typ = 'A') AS BIGINT),
                   CAST(count(*) FILTER (WHERE typ = 'B') AS BIGINT),
                   u IN (SELECT u FROM conv)
            FROM ab GROUP BY u""").fetchall()))

    def test_edges_and_random_match_duckdb(self, ray_session):
        """Equal-ts ties don't convert, exactly-at-window does, B with
        no prior A doesn't; random corpus == DuckDB join oracle."""
        import ray.data as rd

        from archbloom_ray.pipelines import funnel_users

        w_us = 1_000_000  # 1 s window
        rows = [
            (1, 100, "A"), (1, 100, "B"),              # tie: no convert
            (2, 100, "A"), (2, 100 + w_us, "B"),       # boundary: converts
            (3, 100 + w_us, "B"), (3, 200 + w_us, "A"),  # B first: no
            (4, 0, "A"), (4, 2 * w_us, "B"), (4, int(1.5 * w_us), "A"),  # late A rescues
            (5, 50, "C"), (5, 60, "A"),                # other types filtered
        ]
        rng = np.random.default_rng(19)
        rows += [(int(u), int(ts), t) for u, ts, t in zip(
            rng.integers(10, 40, 600), rng.integers(0, 5 * w_us, 600),
            rng.choice(["A", "B", "C"], 600))]
        ds = rd.from_items(
            [{"u": u, "ts": ts, "typ": t} for u, ts, t in rows]).repartition(5)
        # ts column here is already int64 microseconds (pc.cast is identity)
        out = funnel_users(ds, "u", "ts", "typ", "A", "B", w_us / 1e6)
        got = sorted((r["u"], r["n_a"], r["n_b"], r["converted"])
                     for r in out.take_all())
        assert got == self._oracle(rows, w_us)
        per_u = {g[0]: g[3] for g in got}
        assert per_u[1] is False and per_u[2] is True
        assert per_u[3] is False and per_u[4] is True


class TestTransitionCounts:
    def test_matches_duckdb_lead(self, ray_session):
        """Consecutive-pair counts == DuckDB lead() oracle, ties broken
        by the unique tiebreak column, invariant to partitioning."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines import transition_counts

        rng = np.random.default_rng(23)
        n = 700
        rows = [(int(u), int(ts), t, i) for i, (u, ts, t) in enumerate(zip(
            rng.integers(0, 30, n), rng.integers(0, 50, n),  # heavy ts ties
            rng.choice(["x", "y", "z"], n)))]
        ds = rd.from_items(
            [{"u": u, "ts": ts, "typ": t, "eid": i}
             for u, ts, t, i in rows]).repartition(6)
        out = transition_counts(ds, "u", "ts", "typ", "eid")
        got = sorted((r["from_type"], r["to_type"], r["n"])
                     for r in out.take_all())

        con = duckdb.connect()
        con.execute("CREATE TABLE t (u BIGINT, ts BIGINT, typ VARCHAR, eid BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            WITH s AS (SELECT u, typ, lead(typ) OVER (
                           PARTITION BY u ORDER BY ts, eid) AS nxt FROM t)
            SELECT typ, nxt, CAST(count(*) AS BIGINT)
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2""").fetchall()))
        assert got == want
        assert sum(g[2] for g in got) == n - len({r[0] for r in rows})


class TestGroupedDistinctCount:
    def test_matches_duckdb(self, ray_session):
        """Exact COUNT(DISTINCT) per key == DuckDB, duplicates spread
        across partitions."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_distinct_count

        rng = np.random.default_rng(29)
        rows = [(g, int(v)) for g, v in zip(
            rng.choice(["a", "b", "c", "d"], 1200),
            rng.integers(0, 80, 1200))]
        ds = rd.from_items(
            [{"g": g, "v": v} for g, v in rows]).repartition(7)
        got = sorted((r["g"], r["n_distinct"]) for r in
                     grouped_distinct_count(ds, ["g"], "v").take_all())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute(
            "SELECT g, CAST(count(DISTINCT v) AS BIGINT) FROM t GROUP BY g"
        ).fetchall()))
        assert got == want


class TestGroupedPercentileDisc:
    def test_matches_duckdb(self, ray_session):
        """Discrete percentiles (rank ceil(q*n)) == DuckDB
        percentile_disc under heavy ties; bad q raises."""
        import duckdb
        import pytest
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_percentile_disc

        rng = np.random.default_rng(31)
        rows = [(g, int(v)) for g, v in zip(
            rng.choice(["a", "b", "c"], 900),
            rng.integers(0, 12, 900))]   # 12 distinct values → heavy ties
        ds = rd.from_items(
            [{"g": g, "v": v} for g, v in rows]).repartition(5)
        out = grouped_percentile_disc(ds, ["g"], "v", [0.25, 0.5, 0.9])
        got = sorted((r["g"], r["p25"], r["p5"], r["p9"])
                     for r in out.take_all())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            SELECT g,
                   percentile_disc(0.25) WITHIN GROUP (ORDER BY v),
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY v),
                   percentile_disc(0.9) WITHIN GROUP (ORDER BY v)
            FROM t GROUP BY g""").fetchall()))
        assert got == want
        with pytest.raises(ValueError):
            grouped_percentile_disc(ds, ["g"], "v", [0.0])


class TestCohortRetention:
    def test_matches_duckdb(self, ray_session):
        """Retention counts == DuckDB first-week-join oracle on a corpus
        with staggered cohorts and repeat weeks."""
        import datetime

        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines import cohort_retention

        rng = np.random.default_rng(37)
        base = datetime.datetime(2026, 1, 5)  # a Monday
        rows = [(int(u), base + datetime.timedelta(
                    hours=float(h)))
                for u, h in zip(rng.integers(0, 60, 900),
                                rng.uniform(0, 24 * 7 * 6, 900))]
        ds = rd.from_items(
            [{"u": u, "ts": ts} for u, ts in rows]).repartition(5)
        out = cohort_retention(ds, "u", "ts")
        got = sorted((r["cohort_week"], r["activity_week"], r["n_users"])
                     for r in out.take_all())

        con = duckdb.connect()
        con.execute("CREATE TABLE t (u BIGINT, ts TIMESTAMP)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            WITH f AS (SELECT u, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) cw
                       FROM t GROUP BY u),
            a AS (SELECT DISTINCT u, CAST(date_trunc('week', ts) AS TIMESTAMP) aw FROM t)
            SELECT cw, aw, CAST(count(*) AS BIGINT)
            FROM a JOIN f USING (u) GROUP BY cw, aw""").fetchall()))
        assert got == want
        assert len(got) > 6  # staggered cohorts produced a real matrix


class TestGroupingSets:
    def test_cube_matches_duckdb(self, ray_session):
        """CUBE via grouping sets == DuckDB GROUP BY CUBE; validation of
        bad sets."""
        import duckdb
        import pandas as pd
        import pytest
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_grouping_sets

        rng = np.random.default_rng(53)
        df = pd.DataFrame({
            "a": rng.choice(["x", "y", "z"], 600),
            "b": rng.choice(["p", "q"], 600),
            "v": rng.integers(0, 100, 600).astype(np.int64),
        })
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
        out = grouped_grouping_sets(
            ds, ["a", "b"], [("n", None, "count"), ("s", "v", "sum")],
            [["a", "b"], ["a"], ["b"], []])
        got = sorted((r["a"], r["b"], r["n"], r["s"]) for r in out.take_all())
        con = duckdb.connect()
        con.register("t", df)
        want = sorted(map(tuple, con.execute("""
            SELECT coalesce(a, 'ALL'), coalesce(b, 'ALL'),
                   CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
            FROM t GROUP BY CUBE(a, b)""").fetchall()))
        assert got == want
        with pytest.raises(ValueError):
            grouped_grouping_sets(ds, ["a"], [("n", None, "count")], [["c"]])
        with pytest.raises(ValueError):
            grouped_grouping_sets(ds, ["a"], [("n", None, "count")],
                                  [["a"], ["a"]])


class TestDecayedCounts:
    def test_query_matches_oracle_small(self, ray_session):
        """Fixed-point 2^-(age_hours) weighting is bit-exact vs the SQL
        expression at sf0.001 (driver-gate semantics)."""
        import duckdb

        from archbloom_ray.queries import queries, oracle_sql

        sf = "/root/testdata/sf0.001"
        df = queries()["events_decayed_counts"](sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        odf = con.execute(oracle_sql()["events_decayed_counts"]).df()
        assert df.sort_values("event_type").reset_index(drop=True).equals(
            odf.astype({"decayed_fp": "int64"})
               .sort_values("event_type").reset_index(drop=True))
        assert (df["decayed_fp"] > 0).any()


class TestSnapshotDiff:
    def test_matches_duckdb_full_outer(self, ray_session):
        """added/removed/changed classification == DuckDB FULL OUTER
        JOIN on random keyed snapshots; duplicate keys raise."""
        import duckdb
        import pandas as pd
        import pytest
        import ray.data as rd

        from archbloom_ray.pipelines import snapshot_diff

        rng = np.random.default_rng(59)
        keys = rng.permutation(500)[:400]
        old = pd.DataFrame({
            "k": np.sort(keys[:300]).astype(np.int64),
            "v": rng.integers(0, 50, 300).astype(np.int64),
        })
        new = pd.DataFrame({
            "k": np.sort(keys[100:]).astype(np.int64),
            "v": rng.integers(0, 50, 300).astype(np.int64),
        })
        # force some unchanged overlaps
        both = np.intersect1d(old["k"], new["k"])
        fix = both[: len(both) // 2]
        new.loc[new["k"].isin(fix), "v"] = (
            old.set_index("k").loc[fix, "v"].to_numpy())
        lo = rd.from_arrow(pa.Table.from_pandas(old)).repartition(4)
        ln = rd.from_arrow(pa.Table.from_pandas(new)).repartition(3)
        got = sorted((r["k"], r["change"]) for r in
                     snapshot_diff(lo, ln, "k", ["v"]).take_all())
        con = duckdb.connect()
        con.register("o", old)
        con.register("n", new)
        want = sorted(map(tuple, con.execute("""
            SELECT coalesce(o.k, n.k),
                   CASE WHEN o.k IS NULL THEN 'added'
                        WHEN n.k IS NULL THEN 'removed'
                        ELSE 'changed' END
            FROM o FULL OUTER JOIN n ON o.k = n.k
            WHERE o.k IS NULL OR n.k IS NULL OR o.v <> n.v""").fetchall()))
        assert got == want
        dup = rd.from_items([{"k": 1, "v": 1}, {"k": 1, "v": 2}])
        with pytest.raises(Exception, match="duplicate key"):
            snapshot_diff(dup, ln, "k", ["v"]).take_all()


class TestHourlyDense:
    def test_dense_fill_matches_oracle(self, ray_session):
        """Dense resample query == generate_series oracle at sf0.001 and
        really fills gaps with zeros."""
        import duckdb

        from archbloom_ray.queries import queries, oracle_sql

        sf = "/root/testdata/sf0.001"
        df = queries()["events_hourly_dense"](sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        odf = con.execute(oracle_sql()["events_hourly_dense"]).df()
        assert df.sort_values("hour").reset_index(drop=True).equals(
            odf.astype({"n_events": "int64"})
               .sort_values("hour").reset_index(drop=True))
        assert (df["n_events"] == 0).any()


class TestGroupedMad:
    def test_matches_duckdb_exact_floats(self, ray_session):
        """median + mad bit-equal to DuckDB under heavy ties and both
        parities of group size."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_mad

        rng = np.random.default_rng(71)
        rows = [(g, int(v)) for g, v in zip(
            rng.choice(["a", "b", "c"], 901),   # odd total → mixed parities
            rng.integers(0, 15, 901))]
        ds = rd.from_items(
            [{"g": g, "v": v} for g, v in rows]).repartition(6)
        got = sorted((r["g"], r["med"], r["mad"]) for r in
                     grouped_mad(ds, ["g"], "v").take_all())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute(
            "SELECT g, CAST(median(v) AS DOUBLE), CAST(mad(v) AS DOUBLE) "
            "FROM t GROUP BY g").fetchall()))
        assert got == want  # exact float equality, not approx


class TestGroupedWeightedMedian:
    def test_matches_bruteforce(self, ray_session):
        """Smallest v with 2·cumweight ≥ total, per group — checked
        against a per-group brute force incl. value==weight aliasing
        and duplicate values split across partitions."""
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_weighted_median

        rng = np.random.default_rng(97)
        rows = [(g, int(v), int(w)) for g, v, w in zip(
            rng.choice(["a", "b", "c"], 700),
            rng.integers(0, 25, 700),       # heavy ties
            rng.integers(1, 9, 700))]
        ds = rd.from_items(
            [{"g": g, "v": v, "w": w} for g, v, w in rows]).repartition(7)
        got = sorted((r["g"], r["wmedian"]) for r in grouped_weighted_median(
            ds, ["g"], "v", "w").take_all())

        def brute(grp):
            vw = {}
            for g, v, w in rows:
                if g == grp:
                    vw[v] = vw.get(v, 0) + w
            tot = sum(vw.values())
            cum = 0
            for v in sorted(vw):
                cum += vw[v]
                if 2 * cum >= tot:
                    return v

        assert got == [(g, brute(g)) for g in ["a", "b", "c"]]

    def test_weight_equals_value(self, ray_session):
        """value_col == weight_col (length-weighted median of length)
        must not trip duplicate-column grouping."""
        import ray.data as rd

        from archbloom_ray.pipelines import grouped_weighted_median

        ds = rd.from_items(
            [{"g": "x", "v": v} for v in [1, 1, 2, 10]]).repartition(2)
        # weights 1,1,2,10 → total 14, cum at v=2 is 4 (<7), at v=10 is 14
        out = grouped_weighted_median(ds, ["g"], "v", "v").take_all()
        assert out == [{"g": "x", "wmedian": 10}]


class TestTrendingTypes:
    def test_query_matches_oracle_sf0001(self, ray_session):
        """Hopping-window top-3 composition == rank-window oracle."""
        import duckdb

        from archbloom_ray.queries import queries, oracle_sql

        sf = "/root/testdata/sf0.001"
        df = queries()["trending_types"](sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        odf = con.execute(oracle_sql()["trending_types"]).df()
        key = ["ws", "rank"]
        assert df.sort_values(key).reset_index(drop=True).equals(
            odf.astype({c: df[c].dtype for c in df.columns})
               .sort_values(key).reset_index(drop=True))
        assert df.groupby("ws")["rank"].max().max() <= 3


class TestSessionStats:
    def test_matches_gaps_islands_oracle(self, ray_session):
        """Session durations == DuckDB gaps-and-islands SQL on a random
        event log (ties included)."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines import session_stats

        rng = np.random.default_rng(73)
        rows = [(int(u), int(t)) for u, t in zip(
            rng.integers(0, 40, 800),
            rng.integers(0, 5_000, 800) * 1_000_000)]  # μs, heavy ties
        ds = rd.from_items(
            [{"u": u, "ts": t} for u, t in rows]).repartition(5)
        got = sorted((r["u"], r["n_sessions"], r["sum_dur_us"], r["max_dur_us"])
                     for r in session_stats(ds, "u", "ts", 600.0).take_all())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (u BIGINT, ts BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            WITH o AS (SELECT u, ts, CASE WHEN ts - lag(ts) OVER
                           (PARTITION BY u ORDER BY ts) > 600000000
                           THEN 1 ELSE 0 END AS brk FROM t),
            s AS (SELECT u, ts, sum(brk) OVER (PARTITION BY u ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS sid FROM o),
            d AS (SELECT u, max(ts) - min(ts) AS dur FROM s GROUP BY u, sid)
            SELECT u, CAST(count(*) AS BIGINT), CAST(sum(dur) AS BIGINT),
                   CAST(max(dur) AS BIGINT)
            FROM d GROUP BY u""").fetchall()))
        assert got == want


class TestMaxConcurrent:
    def test_sweep_matches_bruteforce(self, ray_session):
        """Distributed two-phase sweep == brute-force point evaluation
        on random closed intervals (touching endpoints overlap)."""
        import ray.data as rd

        from archbloom_ray.pipelines import max_concurrent_intervals

        rng = np.random.default_rng(79)
        s = rng.integers(0, 2_000, 600).astype(np.int64)
        e = s + rng.integers(0, 300, 600).astype(np.int64)
        ds = rd.from_items(
            [{"start_us": int(a), "end_us": int(b)}
             for a, b in zip(s, e)]).repartition(6)
        got = max_concurrent_intervals(ds)
        pts = np.unique(np.concatenate([s, e]))
        want = max(int(((s <= p) & (p <= e)).sum()) for p in pts)
        assert got == want
        # degenerate: all at one instant
        one = rd.from_items([{"start_us": 5, "end_us": 5}] * 7)
        assert max_concurrent_intervals(one) == 7


class TestIntervalOverlapPairs:
    def test_pairs_match_bruteforce(self, ray_session):
        """Bucket-replicated sweep == brute-force O(n²) pair count on
        random closed intervals, with a bucket width small enough that
        most intervals span several buckets (exactly-once attribution
        across bucket boundaries is the property under test)."""
        import ray.data as rd

        from archbloom_ray.pipelines import interval_overlap_pairs

        rng = np.random.default_rng(31)
        n = 400
        k = rng.integers(0, 12, n).astype(np.int64)
        s = rng.integers(0, 3_000, n).astype(np.int64)
        e = s + rng.integers(0, 500, n).astype(np.int64)
        ds = rd.from_items(
            [{"user_id": int(u), "start_us": int(a), "end_us": int(b)}
             for u, a, b in zip(k, s, e)]).repartition(5)
        out = interval_overlap_pairs(ds, "user_id", bucket_width=128)
        got = {(r["u1"], r["u2"]): r["n_overlaps"] for r in out.take_all()}
        want: dict[tuple[int, int], int] = {}
        for i in range(n):
            for j in range(i + 1, n):
                if k[i] != k[j] and s[i] <= e[j] and s[j] <= e[i]:
                    key = (int(min(k[i], k[j])), int(max(k[i], k[j])))
                    want[key] = want.get(key, 0) + 1
        assert got == want

    def test_empty_and_disjoint(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines import interval_overlap_pairs

        ds = rd.from_items([
            {"user_id": 1, "start_us": 0, "end_us": 10},
            {"user_id": 2, "start_us": 11, "end_us": 20},
        ])
        assert interval_overlap_pairs(ds, "user_id",
                                      bucket_width=4).take_all() == []
        # touching endpoints overlap (closed intervals)
        ds2 = rd.from_items([
            {"user_id": 1, "start_us": 0, "end_us": 10},
            {"user_id": 2, "start_us": 10, "end_us": 20},
        ])
        rows = interval_overlap_pairs(ds2, "user_id",
                                      bucket_width=4).take_all()
        assert rows == [{"u1": 1, "u2": 2, "n_overlaps": 1}]


class TestSkyline2D:
    def test_matches_bruteforce_dominance(self, ray_session):
        """Block-local frontier + driver re-pass == quadratic dominance
        scan (minimize p, maximize q; ties and duplicate points
        included in the generator on purpose)."""
        import ray.data as rd

        from archbloom_ray.pipelines import skyline_2d

        rng = np.random.default_rng(47)
        p = rng.integers(0, 40, 800).astype(np.float64)
        q = rng.integers(0, 40, 800).astype(np.float64)
        ds = rd.from_items(
            [{"a": float(x), "b": float(y)}
             for x, y in zip(p, q)]).repartition(7)
        out = skyline_2d(ds, "a", "b")
        got = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
        pts = set(zip(p, q))
        want = {(x, y) for x, y in pts
                if not any(u <= x and v >= y and (u < x or v > y)
                           for u, v in pts)}
        assert got == want
        # output is sorted by the minimized column
        assert out["a"].to_pylist() == sorted(out["a"].to_pylist())


class TestNullSkippingAggs:
    def test_string_agg_and_distinct_skip_nulls(self, ray_session):
        """NULL values are skipped like SQL aggregates."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines import (
            grouped_distinct_count,
            grouped_string_agg,
        )

        rows = [("a", "x"), ("a", None), ("a", "y"), ("b", None), ("b", "z")]
        ds = rd.from_items([{"g": g, "v": v} for g, v in rows]).repartition(3)
        sa = sorted((r["g"], r["n_distinct"], r["agg"]) for r in
                    grouped_string_agg(ds, ["g"], "v").take_all())
        dc = sorted((r["g"], r["n_distinct"]) for r in
                    grouped_distinct_count(ds, ["g"], "v").take_all())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, v VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            SELECT g, CAST(count(DISTINCT v) AS BIGINT),
                   string_agg(DISTINCT v, ',' ORDER BY v)
            FROM t GROUP BY g""").fetchall()))
        assert sa == want
        assert dc == [(g, n) for g, n, _ in want]


class TestGroupedWindowRank:
    def test_matches_duckdb_window_functions(self, ray_session):
        """PERCENT_RANK/CUME_DIST from the broadcast rank table are
        bit-identical to DuckDB's window functions, including ties and
        a single-row partition (percent_rank := 0)."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines.relational import grouped_window_rank

        rng = np.random.default_rng(11)
        rows = [(i, ["en", "de", "fr"][int(rng.integers(0, 3))],
                 int(rng.integers(0, 40)))
                for i in range(400)] + [(400, "solo", 7)]
        ds = rd.from_items(
            [{"doc_id": i, "lang": g, "v": v} for i, g, v in rows]
        ).repartition(5)
        out = grouped_window_rank(ds, ["lang"], "v", ["doc_id"])
        got = {r["doc_id"]: (r["lang"], r["v"], r["pct_rank"], r["cume_dist"])
               for r in out.take_all()}

        con = duckdb.connect()
        con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        want = {d: (g, v, p, c) for d, g, v, p, c in con.execute("""
            SELECT doc_id, lang, v,
                   PERCENT_RANK() OVER (PARTITION BY lang ORDER BY v),
                   CUME_DIST()    OVER (PARTITION BY lang ORDER BY v)
            FROM t""").fetchall()}
        assert got == want  # exact float equality — same int/int divisions

    def test_multi_key_partitions(self, ray_session):
        """Composite (string, int) partition keys rank independently."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines.relational import grouped_window_rank

        rng = np.random.default_rng(13)
        rows = [(i, ["a", "b"][int(rng.integers(0, 2))],
                 int(rng.integers(0, 3)), int(rng.integers(0, 25)))
                for i in range(300)]
        ds = rd.from_items(
            [{"id": i, "g": g, "s": s, "v": v} for i, g, s, v in rows]
        ).repartition(4)
        out = grouped_window_rank(ds, ["g", "s"], "v", ["id"])
        got = {r["id"]: (r["pct_rank"], r["cume_dist"])
               for r in out.take_all()}

        con = duckdb.connect()
        con.execute("CREATE TABLE t (id BIGINT, g VARCHAR, s BIGINT, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
        want = {i: (p, c) for i, p, c in con.execute("""
            SELECT id, PERCENT_RANK() OVER (PARTITION BY g, s ORDER BY v),
                   CUME_DIST() OVER (PARTITION BY g, s ORDER BY v)
            FROM t""").fetchall()}
        assert got == want





class TestGroupedRowNumber:
    def test_matches_row_number_and_ntile(self, ray_session):
        """ROW_NUMBER + NTILE(k) match DuckDB for uneven buckets, heavy
        ties (unique id tie-break), and groups smaller than k."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines.relational import grouped_row_number

        rng = np.random.default_rng(17)
        rows = [(i, ["en", "de", "tiny"][min(int(rng.integers(0, 3)), 2)],
                 int(rng.integers(0, 12)))
                for i in range(350)]
        rows = [r for r in rows if r[1] != "tiny"] + [
            (1000, "tiny", 5), (1001, "tiny", 5)]  # group smaller than k
        ds = rd.from_items(
            [{"id": i, "g": g, "v": v} for i, g, v in rows]).repartition(5)
        out = grouped_row_number(ds, ["g"], "v", "id", ntile=4)
        got = sorted((r["id"], r["row_number"], r["ntile"])
                     for r in out.take_all())

        con = duckdb.connect()
        con.execute("CREATE TABLE t (id BIGINT, g VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            SELECT id, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id),
                   NTILE(4) OVER (PARTITION BY g ORDER BY v, id)
            FROM t""").fetchall()))
        assert got == want


class TestGlobalOrderIndex:
    def test_matches_row_number(self, ray_session):
        """Contiguous global ordinals == ROW_NUMBER() OVER (ORDER BY v,
        id), including heavy ties and values absent from the sample."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines.relational import global_order_index

        rng = np.random.default_rng(23)
        vals = np.concatenate([rng.integers(0, 30, 700),
                               np.full(300, 7)])  # hot value → one bucket
        rows = [(i, int(v)) for i, v in enumerate(vals)]
        ds = rd.from_items([{"id": i, "v": v} for i, v in rows]).repartition(7)
        out = global_order_index(ds, "v", "id", num_buckets=8,
                                 sample_per_block=16)
        got = sorted((r["id"], r["v"], r["global_rank"])
                     for r in out.take_all())

        con = duckdb.connect()
        con.execute("CREATE TABLE t (id BIGINT, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            SELECT id, v, ROW_NUMBER() OVER (ORDER BY v, id) FROM t
        """).fetchall()))
        assert got == want


class TestGlobalPrefixSum:
    def test_matches_window_sum(self, ray_session):
        """Exclusive scan == SUM OVER UNBOUNDED PRECEDING..1 PRECEDING,
        with ids arriving shuffled across partitions."""
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines.relational import global_prefix_sum

        rng = np.random.default_rng(31)
        ids = rng.permutation(600)
        rows = [(int(i), int(rng.integers(0, 50))) for i in ids]
        ds = rd.from_items([{"id": i, "v": v} for i, v in rows]).repartition(6)
        out = global_prefix_sum(ds, "v", "id", num_buckets=8,
                                sample_per_block=16)
        got = sorted((r["id"], r["v"], r["prefix_sum"])
                     for r in out.take_all())

        con = duckdb.connect()
        con.execute("CREATE TABLE t (id BIGINT, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(map(tuple, con.execute("""
            SELECT id, v, COALESCE(SUM(v) OVER (ORDER BY id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            FROM t""").fetchall()))
        assert got == want

class TestDatasetChecksum:
    def test_order_independent_and_mutation_sensitive(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import dataset_checksum

        rng = np.random.default_rng(41)
        rows = [(int(i), int(v)) for i, v in
                enumerate(rng.integers(0, 10_000, 500))]
        a = rd.from_items([{"id": i, "v": v} for i, v in rows]).repartition(3)
        perm = list(rows); rng.shuffle(perm)
        b = rd.from_items([{"id": i, "v": v} for i, v in perm]).repartition(7)
        ca = dataset_checksum(a, ["id", "v"], [1_000_003, 777_751])
        cb = dataset_checksum(b, ["id", "v"], [1_000_003, 777_751])
        assert ca == cb  # partitioning/order invariant
        mut = [(i, v + 1 if i == 250 else v) for i, v in rows]
        c = rd.from_items([{"id": i, "v": v} for i, v in mut]).repartition(3)
        cc = dataset_checksum(c, ["id", "v"], [1_000_003, 777_751])
        assert cc[0] == ca[0] and cc[1] != ca[1]  # one mutated row flips it


class TestRollingMedianK:
    @pytest.mark.parametrize("window", [1, 3, 4, 7])
    def test_matches_duckdb_windowed_median(self, ray_session, window):
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines.relational import rolling_median_k

        rng = np.random.default_rng(window)
        n = 2000
        tbl = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 37, n).astype(np.int64)),
            # duplicate timestamps on purpose: the id tie-break must hold
            "ts": pa.array(rng.integers(0, 500, n).astype(np.int64)).cast(
                pa.timestamp("us")),
            "value": pa.array(rng.normal(size=n)),
        })
        out = rolling_median_k(
            rd.from_arrow(tbl), "user_id", "ts", "value", "event_id",
            window=window).to_pandas().sort_values(
                "event_id", ignore_index=True)
        con = duckdb.connect()
        con.register("events", tbl)
        want = con.sql(f"""
            SELECT event_id,
                   median(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
                       AS roll_median
            FROM events ORDER BY event_id""").df()
        # bit-exact, including the even-count interpolation arithmetic
        assert out["roll_median"].equals(want["roll_median"])


class TestQuantilesBySelection:
    def test_multi_pass_narrowing_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd

        from archbloom_ray.pipelines.relational import quantiles_by_selection

        rng = np.random.default_rng(99)
        # wide domain + tiny bucket count forces several narrowing passes
        v = np.concatenate([
            rng.integers(-10**9, 10**9, 3000),
            rng.integers(0, 50, 1000),        # duplicate-heavy hot range
            np.full(17, 123456789),
        ]).astype(np.int64)
        ds = rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(5)
        qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
        got = quantiles_by_selection(ds, "x", qs, buckets=16)
        con = duckdb.connect()
        con.register("t", pa.table({"x": pa.array(v)}))
        want = [con.sql(f"SELECT quantile_cont(x, {q}) FROM t").fetchone()[0]
                for q in qs]
        assert got == want  # bit-exact, incl. interpolation arithmetic

    def test_constant_column(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import quantiles_by_selection

        ds = rd.from_arrow(pa.table({"x": pa.array([7] * 100, pa.int64())}))
        assert quantiles_by_selection(ds, "x", [0.5, 0.9]) == [7.0, 7.0]


class TestBuildValueCountsFastPath:
    def test_low_cardinality_fast_path_equivalent(self, ray_session):
        """build_sketches' adaptive value_counts pre-aggregation must be
        OUTPUT-IDENTICAL to per-row updates for the multiplicity-blind
        and linear sketches, and within-bounds for the quantile ones."""
        import ray.data as rd

        from archbloom_ray.pipelines import build_sketches
        from archbloom_ray.sketches import (BloomFilter, CountMinSketch,
                                            HyperLogLog, KLLSketch, TDigest)

        rng = np.random.default_rng(11)
        n = 20_000
        tbl = pa.table({
            "lang": pa.array(rng.choice(["en", "de", "fr"], n)),  # low-card
            "url": pa.array([f"u{i}" for i in range(n)]),          # high-card
            "n_chars": pa.array(rng.integers(10, 400, n).astype(np.int64)),
        })
        specs = {
            "bloom": ("lang", lambda: BloomFilter(100, 0.01)),
            "hll": ("lang", lambda: HyperLogLog(12)),
            "cms": ("lang", lambda: CountMinSketch(epsilon=0.01, delta=0.01)),
            "bloom_u": ("url", lambda: BloomFilter(n, 0.01)),
            "td": ("n_chars", lambda: TDigest(100)),
            "kll": ("n_chars", lambda: KLLSketch(100)),
        }
        built = build_sketches(rd.from_arrow(tbl).repartition(4), specs,
                               batch_size=4096)
        # reference: per-row updates on one process
        refs = {}
        for sid, (col, f) in specs.items():
            sk = f()
            sk.update_arrow(tbl[col])
            refs[sid] = sk
        # multiplicity-blind: identical states
        assert bytes(built["bloom"].to_bytes()) == bytes(refs["bloom"].to_bytes())
        assert bytes(built["bloom_u"].to_bytes()) == bytes(refs["bloom_u"].to_bytes())
        np.testing.assert_array_equal(built["hll"].registers,
                                      refs["hll"].registers)
        # linear: identical counts
        np.testing.assert_array_equal(built["cms"].table, refs["cms"].table)
        assert built["cms"].total == refs["cms"].total == n
        # quantile sketches: exact median of a 390-value domain within
        # the sketches' rank error of the true median
        true_med = float(np.median(np.asarray(tbl["n_chars"])))
        assert abs(built["td"].quantile(0.5) - true_med) <= 0.05 * true_med + 5
        assert abs(built["kll"].quantile(0.5) - true_med) <= 0.05 * true_med + 5


class TestAdaptiveJoin:
    def _tables(self):
        rng = np.random.default_rng(5)
        left = pa.table({
            "k": pa.array(rng.integers(0, 40, 500).astype(np.int64)),
            "x": pa.array(np.arange(500, dtype=np.int64)),
        })
        right = pa.table({
            "k": pa.array(np.arange(0, 30, dtype=np.int64)),  # keys 30+ miss
            "label": pa.array([f"v{i}" for i in range(30)]),
        })
        return left, right

    def _expected(self, left, right):
        lab = dict(zip(right["k"].to_pylist(), right["label"].to_pylist()))
        return sorted((k, x, lab[k])
                      for k, x in zip(left["k"].to_pylist(),
                                      left["x"].to_pylist()) if k in lab)

    @pytest.mark.parametrize("limit,want", [(10_000, "broadcast"),
                                            (5, "shuffle")])
    def test_both_strategies_equal_inner_join(self, ray_session, limit, want):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import adaptive_join

        left, right = self._tables()
        out, strategy = adaptive_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            "k", value_columns=["label"], broadcast_limit_rows=limit)
        assert strategy == want
        got = sorted((r["k"], r["x"], r["label"]) for r in out.take_all())
        assert got == self._expected(left, right)


class TestBloomPrunedJoin:
    """bloom_pruned_join must equal hash_join exactly — the Bloom
    prune has no false negatives and the join kills false positives."""

    def _tables(self):
        rng = np.random.default_rng(11)
        # selective join: only keys 0..49 of the right's 0..999 match
        left = pa.table({
            "k": pa.array(rng.integers(0, 50, 300).astype(np.int64)),
            "prio": pa.array([f"p{i % 4}" for i in range(300)]),
        })
        right = pa.table({
            "k": pa.array(rng.integers(0, 1000, 5000).astype(np.int64)),
            "v": pa.array(rng.integers(0, 10**6, 5000).astype(np.int64)),
        })
        return left, right

    def test_equals_plain_hash_join(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import (
            bloom_pruned_join,
            hash_join,
        )

        left, right = self._tables()
        lds = rd.from_arrow(left).repartition(3)
        rds = rd.from_arrow(right).repartition(4)
        got = sorted((r["k"], r["prio"], r["v"]) for r in
                     bloom_pruned_join(lds, rds, "k", fpr=0.01,
                                       num_partitions=4).take_all())
        want = sorted((r["k"], r["prio"], r["v"]) for r in
                      hash_join(lds, rds, "k",
                                num_partitions=4).take_all())
        assert got == want and len(got) > 0

    def test_empty_left_yields_empty(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import bloom_pruned_join

        left = pa.table({"k": pa.array([], pa.int64()),
                         "prio": pa.array([], pa.string())})
        _, right = self._tables()
        out = bloom_pruned_join(rd.from_arrow(left),
                                rd.from_arrow(right).repartition(2), "k")
        assert out.count() == 0


class TestSkewSaltedJoin:
    """skew_salted_join ≡ hash_join with a dominant key: salting the
    hot key's probe rows across reducers must not change the result."""

    def _tables(self):
        rng = np.random.default_rng(23)
        # 70% of left rows carry key 7 — the lang='en' hotspot shape
        keys = np.where(rng.random(2000) < 0.7, 7,
                        rng.integers(0, 100, 2000)).astype(np.int64)
        left = pa.table({
            "k": pa.array(keys),
            "x": pa.array(np.arange(2000, dtype=np.int64)),
        })
        right = pa.table({
            "k": pa.array(np.repeat(np.arange(0, 50, dtype=np.int64), 2)),
            "v": pa.array(np.arange(100, dtype=np.int64)),  # 2 rows/key
        })
        return left, right

    @pytest.mark.parametrize("hot", [None, [7]])
    def test_equals_plain_hash_join(self, ray_session, hot):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import (
            hash_join,
            skew_salted_join,
        )

        left, right = self._tables()
        lds = rd.from_arrow(left).repartition(4)
        rds = rd.from_arrow(right).repartition(2)
        got = sorted((r["k"], r["x"], r["v"]) for r in
                     skew_salted_join(lds, rds, "k", salts=4,
                                      hot_keys=hot, hot_frac=0.05,
                                      num_partitions=4).take_all())
        want = sorted((r["k"], r["x"], r["v"]) for r in
                      hash_join(lds, rds, "k",
                                num_partitions=4).take_all())
        assert got == want and len(got) > 2000  # hot key matched 2-ways

    def test_detects_dominant_key(self, ray_session):
        import ray.data as rd

        from archbloom_ray.sketches.mg import MisraGries
        from archbloom_ray.pipelines.build import build_sketch

        left, _ = self._tables()
        mg = build_sketch(rd.from_arrow(left).repartition(4), "k",
                          lambda: MisraGries(64))
        eb = mg.error_bound()
        hot = {k.decode() for k, c in mg.candidates()
               if c + eb >= 0.05 * mg.n}
        assert "7" in hot and len(hot) < 10


class TestAdaptiveJoinOneToMany:
    """ADVICE r2: the broadcast path must emit EVERY matching right row
    (searchsorted left/right bounds), exactly like the shuffle path."""

    def _tables(self):
        left = pa.table({
            "k": pa.array([1, 2, 3, 1], type=pa.int64()),
            "x": pa.array([10, 20, 30, 40], type=pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1, 1, 2, 5], type=pa.int64()),
            "label": pa.array(["a", "b", "c", "z"]),
        })
        return left, right

    def _expected(self, left, right):
        out = []
        for k, x in zip(left["k"].to_pylist(), left["x"].to_pylist()):
            for rk, lab in zip(right["k"].to_pylist(),
                               right["label"].to_pylist()):
                if rk == k:
                    out.append((k, x, lab))
        return sorted(out)

    @pytest.mark.parametrize("limit,want", [(10_000, "broadcast"),
                                            (2, "shuffle")])
    def test_duplicate_right_keys_expand(self, ray_session, limit, want):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import adaptive_join

        left, right = self._tables()
        out, strategy = adaptive_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(2),
            "k", value_columns=["label"], broadcast_limit_rows=limit)
        assert strategy == want
        got = sorted((r["k"], r["x"], r["label"]) for r in out.take_all())
        assert got == self._expected(left, right)

    def test_empty_right_side_typed_empty(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import adaptive_join

        left, right = self._tables()
        out, strategy = adaptive_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right.slice(0, 0)),
            "k", value_columns=["label"])
        assert strategy == "empty"
        assert out.count() == 0
        schema = out.schema()
        assert schema.names == ["k", "x", "label"]
        assert schema.types[2] == pa.string()

    def test_broadcast_batch_with_zero_hits_keeps_types(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines.relational import adaptive_join

        left = pa.table({"k": pa.array([7, 8], type=pa.int64()),
                         "x": pa.array([1, 2], type=pa.int64())})
        right = pa.table({"k": pa.array([1], type=pa.int64()),
                          "label": pa.array(["a"])})
        out, strategy = adaptive_join(
            rd.from_arrow(left), rd.from_arrow(right),
            "k", value_columns=["label"])
        assert strategy == "broadcast"
        assert out.count() == 0
        assert out.schema().types[2] == pa.string()


class TestChi2Terms:
    def test_no_int64_overflow_at_4m_dominant_source(self):
        """ADVICE r2: den = N_a·N_b·(a+b) is cubic — int64 wrapped at
        ~3M rows with a dominant category; exact big-int math must
        yield the positive fraction-exact value."""
        from fractions import Fraction

        from archbloom_ray.queries import _chi2_terms

        a = np.array([3_900_000, 100_000], dtype=np.int64)
        b = np.array([50_000, 3_950_000], dtype=np.int64)
        terms = _chi2_terms(a, b)
        assert (terms >= 0).all()
        na, nb = int(a.sum()), int(b.sum())
        for t, ai, bi in zip(terms, a.tolist(), b.tolist()):
            num = Fraction(ai * nb - bi * na) ** 2
            den = Fraction(na * nb * (ai + bi))
            exact = num / den
            assert abs(t - float(exact)) <= 1e-9 * float(exact)


class TestShardedBloomBuild:
    """VERDICT r2 item 1: sharded build ≡ monolithic build bit-for-bit,
    with shuffle traffic independent of bitmap size m."""

    def test_bloom_bit_for_bit(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import (
            assemble_sharded_bloom,
            build_sharded_bloom_states,
            build_sketch,
        )

        factory = lambda: BloomFilter(600, 0.01, name="shardtest")
        mono = build_sketch(docs_ds, "text", factory)
        states = build_sharded_bloom_states(
            docs_ds, "text", factory, num_shards=7, batch_size=128)
        sharded = assemble_sharded_bloom(states, factory, num_shards=7)
        assert sharded.to_bytes() == mono.to_bytes()

    def test_bloom_probe_without_assembly(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import (
            build_sharded_bloom_states,
            sharded_bloom_probe,
        )

        factory = lambda: BloomFilter(600, 0.01, name="shardtest")
        states = build_sharded_bloom_states(
            docs_ds, "text", factory, num_shards=7, batch_size=128)
        probed = sharded_bloom_probe(docs_ds, states, "text", factory,
                                     num_shards=7)
        vals = [r["present"] for r in probed.take_all()]
        assert len(vals) == docs_ds.count() and all(vals)  # no false negatives
        # absent keys: FPR stays near the configured accuracy
        import ray.data as rd

        absent = rd.from_arrow(pa.table(
            {"text": pa.array([f"absent-{i}" for i in range(2000)])}))
        fp = sum(r["present"] for r in sharded_bloom_probe(
            absent, states, "text", factory, num_shards=7).take_all())
        assert fp / 2000 < 0.05

    @pytest.mark.parametrize("width", [4, 8, 16, 64])
    def test_cbloom_bit_for_bit(self, ray_session, docs_ds, width):
        from archbloom_ray.pipelines import (
            assemble_sharded_cbloom,
            build_sharded_cbloom_states,
            build_sketch,
        )
        from archbloom_ray.sketches import CountingBloomFilter

        factory = lambda: CountingBloomFilter(600, 0.01, width=width,
                                              name="shardtest")
        mono = build_sketch(docs_ds, "text", factory)
        states = build_sharded_cbloom_states(
            docs_ds, "text", factory, num_shards=5, batch_size=128)
        sharded = assemble_sharded_cbloom(states, factory, num_shards=5)
        assert sharded.to_bytes() == mono.to_bytes()

    @pytest.mark.parametrize("width", [4, 16])
    def test_cbloom_probe_matches_assembled(self, ray_session, docs_ds,
                                            width):
        """sharded_cbloom_probe (no assembly) == the assembled filter's
        count_batch / lookup_batch, incl. the width-4 logical dtype and
        absent-shard ⇒ 0."""
        import ray.data as rd

        from archbloom_ray.pipelines import (
            assemble_sharded_cbloom,
            build_sharded_cbloom_states,
            sharded_cbloom_probe,
        )
        from archbloom_ray.sketches import CountingBloomFilter

        factory = lambda: CountingBloomFilter(600, 0.01, width=width)
        states = build_sharded_cbloom_states(
            docs_ds, "text", factory, num_shards=5, batch_size=128)
        sk = assemble_sharded_cbloom(states, factory, num_shards=5)
        # take_all() row order is not guaranteed — pair each result row
        # with the assembled filter's answer for ITS OWN text
        rows = sharded_cbloom_probe(
            docs_ds, states, "text", factory, num_shards=5).take_all()
        texts = pa.array([r["text"] for r in rows])
        assert [r["count"] for r in rows] == list(sk.count_batch(texts))
        rows = sharded_cbloom_probe(
            docs_ds, states, "text", factory, num_shards=5,
            method="lookup").take_all()
        texts2 = pa.array([r["text"] for r in rows])
        assert [r["present"] for r in rows] == list(sk.lookup_batch(texts2))
        # dropping a shard zeroes its positions (min ⇒ count 0 for keys
        # touching it) — never raises
        part = {s: b for s, b in states.items() if s != 0}
        rows = sharded_cbloom_probe(
            docs_ds, part, "text", factory, num_shards=5).take_all()
        assert min(r["count"] for r in rows) == 0
        with pytest.raises(ValueError, match="probe method"):
            sharded_cbloom_probe(docs_ds, states, "text", factory,
                                 method="nope")

    def test_cbloom_saturation_clamps_like_sequential(self, ray_session):
        """Width-4 counters cap at 15: a hot key driven >15 times per
        shard-sum must clamp exactly like sequential adds."""
        import ray.data as rd

        from archbloom_ray.pipelines import (
            assemble_sharded_cbloom,
            build_sharded_cbloom_states,
        )
        from archbloom_ray.sketches import CountingBloomFilter

        tbl = pa.table({"text": pa.array(["hot"] * 40 + ["cold"] * 2)})
        ds = rd.from_arrow(tbl).repartition(4)
        factory = lambda: CountingBloomFilter(100, 0.01, width=4,
                                              name="sat")
        states = build_sharded_cbloom_states(ds, "text", factory,
                                             num_shards=3, batch_size=8)
        sharded = assemble_sharded_cbloom(states, factory, num_shards=3)
        seq = factory()
        for t in tbl["text"].to_pylist():
            seq.update_arrow(pa.array([t]))
        assert sharded.to_bytes() == seq.to_bytes()
        assert sharded.count("hot") == 15  # clamped at width-4 max

    def test_partial_traffic_independent_of_m(self, ray_session, docs_ds):
        """The scan ships per-shard POSITION LISTS — the flattened
        position volume depends on keys×k, never on m (the whole
        point)."""
        from archbloom_ray.pipelines.build import sharded_bloom_partials

        def n_positions(parts):
            total = 0
            for b in parts.iter_batches(batch_format="pyarrow",
                                        batch_size=None):
                col = b["pos"].combine_chunks()
                total += len(col.flatten())
            return total

        small, _ = sharded_bloom_partials(
            docs_ds, "text", lambda: BloomFilter(600, 0.01),
            num_shards=7, batch_size=128)
        huge, _ = sharded_bloom_partials(
            docs_ds, "text", lambda: BloomFilter(600_000, 0.0001),
            num_shards=64, batch_size=128)
        n_small, n_huge = n_positions(small), n_positions(huge)
        # 1000× bigger m: position volume grows only with k (plus the
        # vanishing in-batch dedup-collision wiggle)
        assert n_huge <= n_small * BloomFilter(600_000, 0.0001).hashcount \
            / max(BloomFilter(600, 0.01).hashcount, 1) * 1.2


class TestShardedTdbloomBuild:
    def test_bit_for_bit_vs_event_time_build(self, ray_session):
        """Sharded slot-max build ≡ build_event_time_sketch ≡ sequential
        adds (max is associative/commutative under one shared epoch)."""
        import ray.data as rd

        from archbloom_ray.pipelines import (
            assemble_sharded_tdbloom,
            build_event_time_sketch,
            build_sharded_tdbloom_states,
        )
        from archbloom_ray.sketches import TimeDecayingBloomFilter

        rng = np.random.default_rng(7)
        n = 4000
        keys = [f"url-{i}" for i in rng.integers(0, 1500, n)]
        secs = rng.integers(1000, 1000 + 200, n).astype(np.int64)
        tbl = pa.table({
            "url": pa.array(keys),
            "ts": pa.array(secs, type=pa.int64()),
            "warc_ts": pa.array(secs * 1_000_000,
                                type=pa.int64()).cast(pa.timestamp("us")),
        })
        ds = rd.from_arrow(tbl).repartition(5)
        factory = lambda: TimeDecayingBloomFilter(
            1500, 0.01, timeout=60, start_time=1000, name="tdshard")

        mono = build_event_time_sketch(ds, "url", "warc_ts", factory,
                                       batch_size=512)
        states = build_sharded_tdbloom_states(
            ds, "url", "ts", factory, num_shards=6, batch_size=512)
        sharded = assemble_sharded_tdbloom(states, factory, num_shards=6)
        assert sharded.to_bytes() == mono.to_bytes()

        seq = factory()
        for k, s in zip(keys, secs.tolist()):
            seq.update_arrow(pa.array([k]), now=s)
        assert sharded.to_bytes() == seq.to_bytes()

        # freshness behaves: keys whose LAST add is inside the 60 s
        # window are always fresh (no false negatives)
        now = int(secs.max())
        last: dict[str, int] = {}
        for k, s in zip(keys, secs.tolist()):
            last[k] = max(last.get(k, 0), s)
        fresh = [k for k, s in last.items() if now - s <= 60][:50]
        assert sharded.lookup_batch(pa.array(fresh), now=now).all()


class TestBuildFilterAuto:
    def test_plan_crossover(self):
        """Small filter over many batches → monolithic; huge filter
        over few rows → sharded (n_batches×m vs n×k×9 cost model)."""
        from archbloom_ray.pipelines import plan_filter_build

        small = BloomFilter(10_000, 0.01)        # ~12 KB state
        assert plan_filter_build(1_000_000, small,
                                 batch_size=65536) == "monolithic"
        huge = BloomFilter(500_000_000, 0.001)   # ~0.9 GB state
        assert plan_filter_build(100_000, huge,
                                 batch_size=65536) == "sharded"

    def test_both_paths_bit_identical(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import build_filter_auto, build_sketch

        # force each plan via batch_size (state ~720 B at expected=600)
        factory = lambda: BloomFilter(600, 0.01, name="auto")
        mono_ref = build_sketch(docs_ds, "text", factory)
        got_m, plan_m = build_filter_auto(docs_ds, "text", factory,
                                          batch_size=16)
        assert plan_m == "monolithic"
        big_factory = lambda: BloomFilter(2_000_000, 0.001, name="auto")
        got_s, plan_s = build_filter_auto(docs_ds, "text", big_factory,
                                          batch_size=65536)
        assert plan_s == "sharded"
        assert got_m.to_bytes() == mono_ref.to_bytes()
        assert got_s.to_bytes() == build_sketch(
            docs_ds, "text", big_factory).to_bytes()

    def test_cbloom_auto_sharded(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import build_filter_auto, build_sketch
        from archbloom_ray.sketches import CountingBloomFilter

        factory = lambda: CountingBloomFilter(1_000_000, 0.001, width=16,
                                              name="auto")
        got, plan = build_filter_auto(docs_ds, "text", factory)
        assert plan == "sharded"
        assert got.to_bytes() == build_sketch(docs_ds, "text",
                                              factory).to_bytes()

    def test_unsupported_type_raises(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import build_filter_auto
        from archbloom_ray.sketches import HyperLogLog

        with pytest.raises(TypeError):
            build_filter_auto(docs_ds, "text", lambda: HyperLogLog(12))


class TestShardedTdcbloomBuild:
    def test_bit_for_bit_vs_event_time_and_sequential(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines import (
            assemble_sharded_tdcbloom,
            build_event_time_sketch,
            build_sharded_tdcbloom_states,
        )
        from archbloom_ray.sketches import TimeDecayingCountingBloomFilter

        rng = np.random.default_rng(11)
        n = 3000
        keys = [f"k-{i}" for i in rng.integers(0, 400, n)]  # hot keys
        secs = rng.integers(2000, 2000 + 150, n).astype(np.int64)
        tbl = pa.table({
            "k": pa.array(keys),
            "ts": pa.array(secs, type=pa.int64()),
            "warc_ts": pa.array(secs * 1_000_000,
                                type=pa.int64()).cast(pa.timestamp("us")),
        })
        ds = rd.from_arrow(tbl).repartition(4)
        factory = lambda: TimeDecayingCountingBloomFilter(
            400, 0.01, timeout=60, start_time=2000, name="tdc",
            counter_width=8)

        mono = build_event_time_sketch(ds, "k", "warc_ts", factory,
                                       batch_size=256)
        states = build_sharded_tdcbloom_states(
            ds, "k", "ts", factory, num_shards=5, batch_size=256)
        sharded = assemble_sharded_tdcbloom(states, factory, num_shards=5)
        assert sharded.to_bytes() == mono.to_bytes()

        seq = factory()
        for k, s in zip(keys, secs.tolist()):
            seq.update_arrow(pa.array([k]), now=s)
        assert sharded.to_bytes() == seq.to_bytes()


class TestMergeShardedStates:
    """Incremental ingest on the scale path: split the corpus in two,
    build each half sharded, merge state maps — must equal the
    one-shot build bit-for-bit for every filter family."""

    def _halves(self, docs_ds):
        import ray.data as rd

        from conftest import SF_DIR
        tbl = pa.parquet.read_table(f"{SF_DIR}/documents.parquet",
                                    columns=["text"])
        cut = tbl.num_rows // 2
        return (rd.from_arrow(tbl.slice(0, cut)).repartition(2),
                rd.from_arrow(tbl.slice(cut)).repartition(2),
                rd.from_arrow(tbl).repartition(3))

    def test_bloom_and_cbloom_increment(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import (
            assemble_sharded_bloom,
            assemble_sharded_cbloom,
            build_sharded_bloom_states,
            build_sharded_cbloom_states,
            merge_sharded_states,
        )
        from archbloom_ray.sketches import CountingBloomFilter

        d1, d2, full = self._halves(docs_ds)
        bf = lambda: BloomFilter(600, 0.01, name="inc")
        s1 = build_sharded_bloom_states(d1, "text", bf, num_shards=7)
        s2 = build_sharded_bloom_states(d2, "text", bf, num_shards=7)
        merged = merge_sharded_states(s1, s2, bf, num_shards=7)
        want = build_sharded_bloom_states(full, "text", bf, num_shards=7)
        assert assemble_sharded_bloom(merged, bf, num_shards=7).to_bytes() \
            == assemble_sharded_bloom(want, bf, num_shards=7).to_bytes()

        cf = lambda: CountingBloomFilter(600, 0.01, width=4, name="inc")
        c1 = build_sharded_cbloom_states(d1, "text", cf, num_shards=5)
        c2 = build_sharded_cbloom_states(d2, "text", cf, num_shards=5)
        cm = merge_sharded_states(c1, c2, cf, num_shards=5)
        cw = build_sharded_cbloom_states(full, "text", cf, num_shards=5)
        assert assemble_sharded_cbloom(cm, cf, num_shards=5).to_bytes() \
            == assemble_sharded_cbloom(cw, cf, num_shards=5).to_bytes()

    def test_td_families_increment(self, ray_session):
        import ray.data as rd

        from archbloom_ray.pipelines import (
            assemble_sharded_tdbloom,
            assemble_sharded_tdcbloom,
            build_sharded_tdbloom_states,
            build_sharded_tdcbloom_states,
            merge_sharded_states,
        )
        from archbloom_ray.sketches import (
            TimeDecayingBloomFilter,
            TimeDecayingCountingBloomFilter,
        )

        rng = np.random.default_rng(5)
        n = 2000
        tbl = pa.table({
            "k": pa.array([f"u-{i}" for i in rng.integers(0, 300, n)]),
            "ts": pa.array(rng.integers(100, 260, n).astype(np.int64)),
        })
        d1 = rd.from_arrow(tbl.slice(0, n // 2)).repartition(2)
        d2 = rd.from_arrow(tbl.slice(n // 2)).repartition(2)
        full = rd.from_arrow(tbl).repartition(3)

        tf = lambda: TimeDecayingBloomFilter(300, 0.01, timeout=60,
                                             start_time=100, name="inc")
        t1 = build_sharded_tdbloom_states(d1, "k", "ts", tf, num_shards=6)
        t2 = build_sharded_tdbloom_states(d2, "k", "ts", tf, num_shards=6)
        tm = merge_sharded_states(t1, t2, tf, num_shards=6)
        tw = build_sharded_tdbloom_states(full, "k", "ts", tf, num_shards=6)
        assert assemble_sharded_tdbloom(tm, tf, num_shards=6).to_bytes() \
            == assemble_sharded_tdbloom(tw, tf, num_shards=6).to_bytes()

        cf = lambda: TimeDecayingCountingBloomFilter(
            300, 0.01, timeout=60, start_time=100, name="inc",
            counter_width=8)
        c1 = build_sharded_tdcbloom_states(d1, "k", "ts", cf, num_shards=6)
        c2 = build_sharded_tdcbloom_states(d2, "k", "ts", cf, num_shards=6)
        cm = merge_sharded_states(c1, c2, cf, num_shards=6)
        cw = build_sharded_tdcbloom_states(full, "k", "ts", cf,
                                           num_shards=6)
        assert assemble_sharded_tdcbloom(cm, cf, num_shards=6).to_bytes() \
            == assemble_sharded_tdcbloom(cw, cf, num_shards=6).to_bytes()


class TestShardedScalableBloom:
    """Unknown-n scale path: key-hash-sharded SBF build — shuffle is 16
    bytes/key regardless of chain growth, probes route to ONE shard so
    the p0/(1−r) bound survives distribution (concat-merge's doesn't)."""

    def _states(self, docs_ds, shards=8):
        from archbloom_ray.pipelines import build_sharded_sbf_states
        from archbloom_ray.sketches import ScalableBloomFilter

        return build_sharded_sbf_states(
            docs_ds, "text", lambda: ScalableBloomFilter(32, 0.001),
            num_shards=shards)

    def test_no_false_negatives_and_bounded_fpr(self, ray_session, docs_ds):
        import ray.data
        import pyarrow as pa
        from archbloom_ray.pipelines import sharded_sbf_probe

        states = self._states(docs_ds)
        probed = sharded_sbf_probe(docs_ds, states, "text", num_shards=8)
        assert all(r["present"] for r in probed.take_all())

        absent = ray.data.from_arrow(pa.table(
            {"text": [f"never-seen-{i}" for i in range(20_000)]}))
        fp = sum(r["present"] for r in
                 sharded_sbf_probe(absent, states, "text",
                                   num_shards=8).take_all())
        # routing: each probe consults one shard, so the chain bound
        # applies per key.  The engine stage's truncated-k sizing quirk
        # (bloom.c:56 parity) lands its real design error at ~2.6×p0,
        # so gate at 5×p0/(1−r) — far under the 0.026 the pre-fmix
        # correlated routing measured (hashing.fmix64_batch docstring).
        assert fp / 20_000 <= 5 * 0.001 / (1 - 0.9)

    def test_build_deterministic(self, ray_session, docs_ds):
        a = self._states(docs_ds)
        b = self._states(docs_ds)
        assert a.keys() == b.keys()
        assert all(a[s] == b[s] for s in a)

    def test_shards_grew_stages(self, ray_session, docs_ds):
        from archbloom_ray.sketches.base import sketch_from_bytes

        states = self._states(docs_ds)
        chains = [sketch_from_bytes(b) for b in states.values()]
        # 500 docs over 8 shards at initial capacity 32 ⇒ growth happened
        assert any(c.n_stages >= 2 for c in chains)
        total = sum(c.items_added() for c in chains)
        n_distinct = len(set(
            pq.read_table(DOCS, columns=["text"])["text"].to_pylist()))
        assert total == n_distinct  # shards partition the key space


class TestShardedCuckoo:
    """Distributed DELETABLE membership: key-hash-sharded cuckoo build
    sidesteps the non-mergeable kick chains (cuckoo.c merge TODO) —
    4 bytes/key shuffle, probe AND delete route by fmix64(h) % S."""

    SHARDS = 8

    def _states(self, docs_ds):
        from archbloom_ray.pipelines import build_sharded_cuckoo_states
        from archbloom_ray.sketches import CuckooFilter

        # ~500 docs / 8 shards ≈ 63 keys; 64 buckets × 4 slots = 256
        return build_sharded_cuckoo_states(
            docs_ds, "text", lambda: CuckooFilter(64, 4),
            num_shards=self.SHARDS)

    def test_membership_and_fpr(self, ray_session, docs_ds):
        import ray.data
        import pyarrow as pa
        from archbloom_ray.pipelines import sharded_cuckoo_probe

        states = self._states(docs_ds)
        assert all(r["present"] for r in sharded_cuckoo_probe(
            docs_ds, states, "text", num_shards=self.SHARDS).take_all())
        absent = ray.data.from_arrow(pa.table(
            {"text": [f"never-{i}" for i in range(20_000)]}))
        fp = sum(r["present"] for r in sharded_cuckoo_probe(
            absent, states, "text", num_shards=self.SHARDS).take_all())
        # 16-bit fps, 2 buckets × 4 slots consulted ⇒ ~8·2^-16 ≈ 1.2e-4
        assert fp / 20_000 <= 2e-3

    def test_build_deterministic(self, ray_session, docs_ds):
        a, b = self._states(docs_ds), self._states(docs_ds)
        assert a.keys() == b.keys() and all(a[s] == b[s] for s in a)

    def test_distributed_delete(self, ray_session, docs_ds):
        import ray.data
        import pyarrow as pa
        from archbloom_ray.pipelines import (
            sharded_cuckoo_delete,
            sharded_cuckoo_probe,
        )

        states = self._states(docs_ds)
        texts = pq.read_table(DOCS, columns=["text"])["text"].to_pylist()
        gone, kept = sorted(set(texts))[:40], sorted(set(texts))[40:]
        dels = ray.data.from_arrow(pa.table({"text": gone}))
        updated = sharded_cuckoo_delete(dels, states, "text",
                                        num_shards=self.SHARDS)
        # untouched shards keep their exact bytes
        assert set(updated) == set(states)
        # deleted keys gone (no same-(bucket,fp) twins in this corpus —
        # deterministic given the fixed data), kept keys still present
        probe = ray.data.from_arrow(pa.table({"text": gone + kept}))
        res = {r["text"]: r["present"] for r in sharded_cuckoo_probe(
            probe, updated, "text", num_shards=self.SHARDS).take_all()}
        assert not any(res[t] for t in gone)
        assert all(res[t] for t in kept)


class TestShardedKeyhashIngest:
    """Incremental ingest into key-hash-sharded states: only touched
    shards rewritten; SBF chains GROW in place so the single-writer
    p0/(1−r) bound holds across increments (concat-merge would add)."""

    def _halves(self, docs_ds):
        import pyarrow as pa

        def half(lo: bool):
            def fn(batch: pa.Table) -> pa.Table:
                import numpy as np
                ids = np.asarray(batch["doc_id"], dtype=np.int64)
                return batch.filter(pa.array((ids % 2 == 0) == lo))
            return fn
        a = docs_ds.map_batches(half(True), batch_format="pyarrow")
        b = docs_ds.map_batches(half(False), batch_format="pyarrow")
        return a, b

    def test_sbf_ingest_grows_in_place(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import (
            build_sharded_sbf_states,
            sharded_sbf_ingest,
            sharded_sbf_probe,
        )
        from archbloom_ray.sketches import ScalableBloomFilter
        from archbloom_ray.sketches.base import sketch_from_bytes

        fac = lambda: ScalableBloomFilter(32, 0.001)
        first, second = self._halves(docs_ds)
        states = build_sharded_sbf_states(first, "text", fac, num_shards=8)
        updated = sharded_sbf_ingest(second, states, "text", fac,
                                     num_shards=8)
        probed = sharded_sbf_probe(docs_ds, updated, "text", num_shards=8)
        assert all(r["present"] for r in probed.take_all())
        # every chain is still a single-writer chain: bound ≤ p0/(1−r)
        for b in updated.values():
            assert sketch_from_bytes(b).error_bound() <= 0.001 / (1 - 0.9)

    def test_cuckoo_ingest_only_touched_shards(self, ray_session, docs_ds):
        import pyarrow as pa
        import ray.data
        from archbloom_ray.pipelines import (
            build_sharded_cuckoo_states,
            sharded_cuckoo_ingest,
            sharded_cuckoo_probe,
        )
        from archbloom_ray.sketches import CuckooFilter

        fac = lambda: CuckooFilter(64, 4)
        states = build_sharded_cuckoo_states(docs_ds, "text", fac,
                                             num_shards=8)
        add = ray.data.from_arrow(pa.table({"text": ["brand-new-key-1"]}))
        updated = sharded_cuckoo_ingest(add, states, "text", fac,
                                        num_shards=8)
        changed = [s for s in updated if updated[s] != states.get(s)]
        assert len(changed) == 1        # one key ⇒ one touched shard
        probe = ray.data.from_arrow(pa.table(
            {"text": ["brand-new-key-1"]}))
        assert all(r["present"] for r in sharded_cuckoo_probe(
            probe, updated, "text", num_shards=8).take_all())


class TestRoutedProbe:
    """Shuffle-routed probe ≡ broadcast probe for both key-hash
    families; each reducer holds exactly ONE shard's state."""

    def test_routed_equals_broadcast(self, ray_session, docs_ds):
        import pyarrow as pa
        import ray.data
        from archbloom_ray.pipelines import (
            build_sharded_cuckoo_states,
            build_sharded_sbf_states,
            sharded_cuckoo_probe,
            sharded_keyhash_probe_routed,
            sharded_sbf_probe,
        )
        from archbloom_ray.sketches import CuckooFilter, ScalableBloomFilter

        mixed = ray.data.from_arrow(pa.table({
            "text": pq.read_table(DOCS, columns=["text"])["text"].to_pylist()
                    + [f"absent-{i}" for i in range(3000)]}))

        sbf_states = build_sharded_sbf_states(
            docs_ds, "text", lambda: ScalableBloomFilter(32, 0.001),
            num_shards=8)
        want = {r["text"]: r["present"] for r in sharded_sbf_probe(
            mixed, sbf_states, "text", num_shards=8).take_all()}
        got = {r["text"]: r["present"] for r in sharded_keyhash_probe_routed(
            mixed, sbf_states, "text", kind="sbf", num_shards=8).take_all()}
        assert got == want

        ck_states = build_sharded_cuckoo_states(
            docs_ds, "text", lambda: CuckooFilter(64, 4), num_shards=8)
        want = {r["text"]: r["present"] for r in sharded_cuckoo_probe(
            mixed, ck_states, "text", num_shards=8).take_all()}
        got = {r["text"]: r["present"] for r in sharded_keyhash_probe_routed(
            mixed, ck_states, "text", kind="cuckoo",
            num_shards=8).take_all()}
        assert got == want


class TestRoutedBloomProbe:
    """Position-sharded Bloom's routed probe ≡ broadcast probe — each
    reducer holds one bitmap slice; a key's k positions fan out and
    re-AND by id."""

    def test_routed_equals_broadcast(self, ray_session, docs_ds):
        import pyarrow as pa
        import ray.data
        from archbloom_ray.pipelines import (
            build_sharded_bloom_states,
            sharded_bloom_probe,
            sharded_bloom_probe_routed,
        )
        from archbloom_ray.sketches import BloomFilter

        fac = lambda: BloomFilter(500, 0.01)
        states = build_sharded_bloom_states(docs_ds, "text", fac,
                                            num_shards=8)
        texts = pq.read_table(DOCS, columns=["text"])["text"].to_pylist()
        mixed = ray.data.from_arrow(pa.table({
            "pid": pa.array(range(len(texts) + 3000), type=pa.int64()),
            "text": texts + [f"absent-{i}" for i in range(3000)]}))
        want = {r["pid"]: r["present"] for r in sharded_bloom_probe(
            mixed, states, "text", fac, num_shards=8).take_all()}
        got = {r["pid"]: r["present"] for r in sharded_bloom_probe_routed(
            mixed, states, "pid", "text", fac, num_shards=8).take_all()}
        assert got == want
        assert all(want[i] for i in range(len(texts)))  # members present


def test_global_prefix_max_matches_numpy(ray_session):
    """Exclusive prefix max over shuffled-block input ≡ the sequential
    scan; −inf sentinel on the first id; carry column rides through."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from archbloom_ray.pipelines import global_prefix_max

    rng = np.random.default_rng(7)
    n = 20_000
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.normal(size=n)
    tag = (ids % 3).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"i": ids, "v": vals, "tag": tag})).repartition(13)
    out = global_prefix_max(ds, "v", "i", out="wm",
                            carry_columns=("tag",))
    rows = {r["i"]: (r["wm"], r["tag"]) for r in out.take_all()}
    assert len(rows) == n
    order = np.argsort(ids)
    seq = np.concatenate(([-np.inf],
                          np.maximum.accumulate(vals[order])[:-1]))
    for idx, i in enumerate(ids[order]):
        wm, t = rows[i]
        assert (np.isneginf(wm) and np.isneginf(seq[idx])) or wm == seq[idx]
        assert t == i % 3


def test_routed_xor_probe_equals_broadcast(ray_session, docs_ds):
    import pyarrow as pa
    import ray.data
    from archbloom_ray.pipelines import sharded_keyhash_probe_routed
    from archbloom_ray.pipelines.staticfilter import (
        build_sharded_xor,
        sharded_xor_probe,
    )

    states = build_sharded_xor(docs_ds, "text", num_shards=4)
    mixed = ray.data.from_arrow(pa.table({
        "text": pq.read_table(DOCS, columns=["text"])["text"].to_pylist()
                + [f"absent-{i}" for i in range(3000)]}))
    want = {r["text"]: r["present"] for r in sharded_xor_probe(
        mixed, states, "text", num_shards=4).take_all()}
    got = {r["text"]: r["present"] for r in sharded_keyhash_probe_routed(
        mixed, states, "text", kind="xor", num_shards=4).take_all()}
    assert got == want


class TestShardedQF:
    """Sharded quotient-filter build: fingerprint-RANGE partitioning,
    union of shard states ≡ monolithic build (exact fps equality),
    routed probe ≡ broadcast probe, counting variant sums exactly."""

    def test_qf_union_equals_monolithic(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import (
            assemble_sharded_qf,
            build_sharded_qf_states,
            build_sketch,
        )
        from archbloom_ray.sketches import QuotientFilter

        factory = lambda: QuotientFilter(600, 0.001, name="shardtest")
        mono = build_sketch(docs_ds, "text", factory)
        states = build_sharded_qf_states(
            docs_ds, "text", factory, num_shards=7, batch_size=128)
        sharded = assemble_sharded_qf(states, factory)
        assert np.array_equal(sharded.fps, mono.fps)
        # disjoint ranges: every shard state's fps stay in its window
        from archbloom_ray.pipelines.build import _qf_shard_width
        from archbloom_ray.sketches.base import sketch_from_bytes
        W = _qf_shard_width(factory().p, 7)
        for s, b in states.items():
            fps = sketch_from_bytes(b).fps
            assert ((fps // W) == s).all()

    def test_qf_probe_without_assembly(self, ray_session, docs_ds):
        from archbloom_ray.pipelines import (
            build_sharded_qf_states,
            sharded_qf_probe,
        )
        from archbloom_ray.sketches import QuotientFilter
        import ray.data as rd

        factory = lambda: QuotientFilter(600, 0.001, name="shardtest")
        states = build_sharded_qf_states(
            docs_ds, "text", factory, num_shards=7, batch_size=128)
        probed = sharded_qf_probe(docs_ds, states, "text", factory,
                                  num_shards=7)
        vals = [r["present"] for r in probed.take_all()]
        assert len(vals) == docs_ds.count() and all(vals)
        absent = rd.from_arrow(pa.table(
            {"text": pa.array([f"absent-{i}" for i in range(2000)])}))
        fp = sum(r["present"] for r in sharded_qf_probe(
            absent, states, "text", factory, num_shards=7).take_all())
        assert fp / 2000 < 0.05

    def test_cqf_counts_exact(self, ray_session):
        from archbloom_ray.pipelines import (
            build_sharded_cqf_states,
            build_sketch,
            sharded_qf_probe,
        )
        from archbloom_ray.sketches import CountingQuotientFilter
        import ray.data as rd

        keys = np.repeat([f"k-{i}" for i in range(300)],
                         np.arange(300) % 5 + 1)
        rng = np.random.default_rng(11)
        rng.shuffle(keys)
        ds = rd.from_arrow(pa.table({"key": pa.array(list(keys))}))
        factory = lambda: CountingQuotientFilter(400, fpr=2.0 ** -40,
                                                 name="shardtest")
        mono = build_sketch(ds, "key", factory)
        states = build_sharded_cqf_states(
            ds, "key", factory, num_shards=5, batch_size=64)
        from archbloom_ray.pipelines import assemble_sharded_qf
        merged = assemble_sharded_qf(states, factory)
        assert np.array_equal(merged.fps, mono.fps)
        assert np.array_equal(merged.counts, mono.counts)
        probe = rd.from_arrow(pa.table(
            {"key": pa.array([f"k-{i}" for i in range(300)] + ["absent"])}))
        rows = sharded_qf_probe(probe, states, "key", factory,
                                num_shards=5, method="count_batch",
                                out_column="n").take_all()
        got = {r["key"]: r["n"] for r in rows}
        for i in range(300):
            assert got[f"k-{i}"] == i % 5 + 1
        assert got["absent"] == 0

    def test_qf_overflow_detected_across_shards(self, ray_session):
        from archbloom_ray.pipelines import build_sharded_qf_states
        from archbloom_ray.sketches import QuotientFilter, SketchError
        import ray.data as rd

        ds = rd.from_arrow(pa.table(
            {"key": pa.array([f"k-{i}" for i in range(600)])}))
        factory = lambda: QuotientFilter(16, 0.01)  # 2^q far below 600
        with pytest.raises(SketchError, match="overflow"):
            build_sharded_qf_states(ds, "key", factory, num_shards=4,
                                    batch_size=64)
