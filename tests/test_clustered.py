"""Clustered write + zone-map skip reads (pipelines.write)."""
import json
import os

import numpy as np
import pyarrow as pa

from archbloom_ray.pipelines.write import read_clustered, write_clustered


def _mk(rd, n=5000):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 10_000, n)
    return rd.from_items(
        [{"k": int(i), "v": int(v)} for i, v in enumerate(vals)]), vals


class TestClustered:
    def test_roundtrip_and_manifest(self, ray_session, tmp_path):
        import ray.data as rd

        ds, vals = _mk(rd)
        out = write_clustered(ds, str(tmp_path / "c"), "v", num_shards=8)
        man = json.load(open(os.path.join(out, "_zonemap.json")))
        assert man["cluster_col"] == "v"
        assert sum(s["rows"] for s in man["shards"]) == len(vals)
        # shard ranges are disjoint-ish (clustered): lo <= hi per shard,
        # and sorted by shard id the ranges are non-decreasing
        los = [s["lo"] for s in sorted(man["shards"], key=lambda s: s["shard"])]
        assert los == sorted(los)
        got = sorted(r["v"] for r in read_clustered(out).take_all())
        assert got == sorted(vals.tolist())

    def test_skip_read_prunes_shards(self, ray_session, tmp_path):
        import ray.data as rd

        ds, vals = _mk(rd)
        out = write_clustered(ds, str(tmp_path / "c"), "v", num_shards=8)
        man = json.load(open(os.path.join(out, "_zonemap.json")))
        lo, hi = 100, 600
        overlapping = [s for s in man["shards"]
                       if s["hi"] >= lo and s["lo"] <= hi]
        assert len(overlapping) < len(man["shards"])  # pruning is real
        got = read_clustered(out, lo, hi)
        rows = [r["v"] for r in got.take_all()]
        # admitted superset: every in-range value present, residual needed
        in_range = [int(v) for v in vals if lo <= v <= hi]
        assert sorted(v for v in rows if lo <= v <= hi) == sorted(in_range)
        # admitted rows are bounded by the overlapping shards' row mass
        assert len(rows) == sum(s["rows"] for s in overlapping)

    def test_empty_selection_keeps_schema(self, ray_session, tmp_path):
        import ray.data as rd

        ds, _ = _mk(rd, n=500)
        out = write_clustered(ds, str(tmp_path / "c"), "v", num_shards=4)
        got = read_clustered(out, 1_000_000, 2_000_000)
        assert got.count() == 0
        assert set(got.schema().names) == {"k", "v"}

    def test_idempotent_rerun(self, ray_session, tmp_path):
        import ray.data as rd

        ds, vals = _mk(rd, n=800)
        out1 = write_clustered(ds, str(tmp_path / "c"), "v", num_shards=4)
        m1 = json.load(open(os.path.join(out1, "_zonemap.json")))
        out2 = write_clustered(ds, str(tmp_path / "c"), "v", num_shards=4)
        m2 = json.load(open(os.path.join(out2, "_zonemap.json")))
        assert out1 == out2 and m1 == m2  # _SUCCESS short-circuits

    def test_compaction_preserves_data_and_zonemaps(self, ray_session, tmp_path):
        import ray.data as rd

        from archbloom_ray.pipelines.write import compact_clustered

        ds, vals = _mk(rd, n=4000)
        out = write_clustered(ds, str(tmp_path / "c"), "v", num_shards=16)
        before = json.load(open(os.path.join(out, "_zonemap.json")))
        n_after = compact_clustered(out, min_rows=1000)
        after = json.load(open(os.path.join(out, "_zonemap.json")))
        assert n_after == len(after["shards"]) < len(before["shards"])
        assert sum(s["rows"] for s in after["shards"]) == len(vals)
        # zone ranges still ordered and consistent
        los = [s["lo"] for s in after["shards"]]
        assert los == sorted(los)
        # full data intact and a pruned read still correct
        got = sorted(r["v"] for r in read_clustered(out).take_all())
        assert got == sorted(vals.tolist())
        lo, hi = 200, 900
        rows = [r["v"] for r in read_clustered(out, lo, hi).take_all()]
        in_range = [int(v) for v in vals if lo <= v <= hi]
        assert sorted(v for v in rows if lo <= v <= hi) == sorted(in_range)

    def test_compaction_noop_when_already_coarse(self, ray_session, tmp_path):
        import ray.data as rd

        from archbloom_ray.pipelines.write import compact_clustered

        ds, vals = _mk(rd, n=1000)
        out = write_clustered(ds, str(tmp_path / "c"), "v", num_shards=2)
        before = json.load(open(os.path.join(out, "_zonemap.json")))
        assert compact_clustered(out, min_rows=10) == len(before["shards"])
        after = json.load(open(os.path.join(out, "_zonemap.json")))
        assert after == before  # untouched
