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


class TestZOrdered:
    def _mk2(self, rd, n=6000):
        rng = np.random.default_rng(11)
        x = rng.integers(0, 1000, n)
        y = rng.integers(0, 1000, n)
        return rd.from_items(
            [{"k": int(i), "x": int(a), "y": int(b)}
             for i, (a, b) in enumerate(zip(x, y))]), x, y

    def test_zorder_key_interleaves(self):
        from archbloom_ray.pipelines.write import zorder_key

        x = np.array([0, 65535, 65535, 0], dtype=np.int64)
        y = np.array([0, 0, 65535, 65535], dtype=np.int64)
        z = zorder_key(x, y, (0, 65535), (0, 65535))
        assert z[0] == 0
        assert z[1] == 0x55555555          # x bits in even positions
        assert z[2] == 0xFFFFFFFF
        assert z[3] == 0xAAAAAAAA          # y bits in odd positions

    def test_roundtrip_and_both_axis_zonemaps(self, ray_session, tmp_path):
        import ray.data as rd

        from archbloom_ray.pipelines.write import read_zordered, write_zordered

        ds, x, y = self._mk2(rd)
        out = write_zordered(ds, str(tmp_path / "z"), "x", "y", num_shards=16)
        man = json.load(open(os.path.join(out, "_zonemap.json")))
        assert man["col_x"] == "x" and man["col_y"] == "y"
        assert sum(s["rows"] for s in man["shards"]) == len(x)
        got = sorted(r["k"] for r in read_zordered(out).take_all())
        assert got == list(range(len(x)))

    def test_box_read_prunes_on_both_axes(self, ray_session, tmp_path):
        import ray.data as rd

        from archbloom_ray.pipelines.write import read_zordered, write_zordered

        ds, x, y = self._mk2(rd)
        out = write_zordered(ds, str(tmp_path / "z"), "x", "y", num_shards=16)
        man = json.load(open(os.path.join(out, "_zonemap.json")))
        n_shards = len(man["shards"])
        # a narrow box prunes; so does a range on EACH single axis —
        # the property 1-D clustering cannot give on its second column
        for box in [(100, 300, 100, 300), (0, 120, None, None),
                    (None, None, 0, 120)]:
            x_lo, x_hi, y_lo, y_hi = box
            keep = [s for s in man["shards"]
                    if (x_lo is None or s["x_hi"] >= x_lo)
                    and (x_hi is None or s["x_lo"] <= x_hi)
                    and (y_lo is None or s["y_hi"] >= y_lo)
                    and (y_hi is None or s["y_lo"] <= y_hi)]
            assert len(keep) < n_shards, box
            rows = read_zordered(out, *box).take_all()
            assert len(rows) == sum(s["rows"] for s in keep)
            # admitted superset contains every truly-in-box row
            def inside(a, b):
                return ((x_lo is None or a >= x_lo)
                        and (x_hi is None or a <= x_hi)
                        and (y_lo is None or b >= y_lo)
                        and (y_hi is None or b <= y_hi))
            want = sorted(i for i, (a, b) in enumerate(zip(x, y))
                          if inside(a, b))
            got = sorted(r["k"] for r in rows
                         if inside(r["x"], r["y"]))
            assert got == want, box

    def test_empty_box_keeps_schema(self, ray_session, tmp_path):
        import ray.data as rd

        from archbloom_ray.pipelines.write import read_zordered, write_zordered

        ds, _x, _y = self._mk2(rd, n=400)
        out = write_zordered(ds, str(tmp_path / "z"), "x", "y", num_shards=4)
        got = read_zordered(out, 10_000, 20_000)
        assert got.count() == 0
        assert set(got.schema().names) == {"k", "x", "y"}
