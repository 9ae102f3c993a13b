"""Checkpointed build: resume skips finished shards; corrupt state recomputes."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archbloom_ray.sketches import BloomFilter, HyperLogLog
from archbloom_ray.pipelines.checkpoint import (
    checkpointed_build,
    partition_metrics,
    read_manifest,
)


@pytest.fixture()
def shards(tmp_path):
    paths = []
    for i in range(4):
        tbl = pa.table({"key": [f"shard{i}-key{j}" for j in range(500)]})
        p = str(tmp_path / f"shard-{i}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


# NB: a lambda (pickled by value) — a module-level def would be pickled
# by reference and Ray workers can't import test modules
_factory = lambda: BloomFilter(5000, 0.01)  # noqa: E731


class TestCheckpointedBuild:
    def test_build_and_resume(self, ray_session, shards, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        sk1, rep1 = checkpointed_build(shards, "key", _factory, ckpt)
        assert rep1["built_shards"] == 4 and rep1["resumed_shards"] == 0
        assert rep1["rows"] == 2000

        # resume: nothing recomputed, identical result
        sk2, rep2 = checkpointed_build(shards, "key", _factory, ckpt)
        assert rep2["built_shards"] == 0 and rep2["resumed_shards"] == 4
        assert np.array_equal(sk1.bitmap, sk2.bitmap)

        # equals an uninterrupted single build
        direct = BloomFilter(5000, 0.01)
        for p in shards:
            direct.update_arrow(pq.read_table(p)["key"])
        assert np.array_equal(sk1.bitmap, direct.bitmap)

    def test_partial_resume(self, ray_session, shards, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        # first run over half the shards
        checkpointed_build(shards[:2], "key", _factory, ckpt)
        # full run resumes the 2 finished, builds the 2 new
        sk, rep = checkpointed_build(shards, "key", _factory, ckpt)
        assert rep["resumed_shards"] == 2 and rep["built_shards"] == 2
        direct = BloomFilter(5000, 0.01)
        for p in shards:
            direct.update_arrow(pq.read_table(p)["key"])
        assert np.array_equal(sk.bitmap, direct.bitmap)

    def test_corrupt_state_recomputed(self, ray_session, shards, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        checkpointed_build(shards, "key", _factory, ckpt)
        manifest = read_manifest(ckpt)
        victim = next(iter(manifest))
        with open(os.path.join(ckpt, f"part-{victim}.state"), "wb") as f:
            f.write(b"torn write garbage")
        sk, rep = checkpointed_build(shards, "key", _factory, ckpt)
        assert rep["built_shards"] == 1  # only the corrupt shard redone
        direct = BloomFilter(5000, 0.01)
        for p in shards:
            direct.update_arrow(pq.read_table(p)["key"])
        assert np.array_equal(sk.bitmap, direct.bitmap)

    def test_metrics_table(self, ray_session, shards, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        checkpointed_build(shards, "key", lambda: HyperLogLog(12), ckpt)
        m = partition_metrics(ckpt)
        assert m.num_rows == 4
        assert set(m.column_names) >= {"shard_id", "input_path", "rows",
                                       "state_sha256", "update_ms"}
        assert sum(m["rows"].to_pylist()) == 2000


class TestResumableWrite:
    def test_write_partitioned_idempotent(self, ray_session, tmp_path):
        import ray.data
        from archbloom_ray.pipelines.write import write_partitioned

        ds = ray.data.from_items(
            [{"k": i % 3, "v": i} for i in range(100)])
        out = str(tmp_path / "out")
        write_partitioned(ds, out, partition_cols=["k"])
        import pyarrow.parquet as pq, pyarrow.dataset as pads
        t1 = pads.dataset(out, format="parquet", partitioning="hive").to_table()
        assert t1.num_rows == 100
        # second call with a complete marker is a no-op
        write_partitioned(ds, out, partition_cols=["k"])
        t2 = pads.dataset(out, format="parquet", partitioning="hive").to_table()
        assert t2.num_rows == 100

    def test_resumable_shard_map_skips_finished(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pyarrow.compute as pc
        from archbloom_ray.pipelines.write import resumable_shard_map

        ins = []
        for i in range(3):
            p = str(tmp_path / f"in-{i}.parquet")
            pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}), p)
            ins.append(p)

        def double(t: pa.Table) -> pa.Table:
            return pa.table({"x2": pc.multiply(t["x"], 2)})

        r1 = resumable_shard_map(ins, double, str(tmp_path / "out"))
        assert r1 == {"total": 3, "skipped": 0, "written": 3}
        r2 = resumable_shard_map(ins, double, str(tmp_path / "out"))
        assert r2 == {"total": 3, "skipped": 3, "written": 0}
        got = pq.read_table(str(tmp_path / "out" / "in-1")).column("x2").to_pylist()
        assert got == [x * 2 for x in range(10, 20)]


class TestKeyedStoreUpsert:
    def test_cow_upsert_last_writer_wins(self, ray_session, tmp_path):
        """Upsert == pandas combine: updates override, inserts land,
        untouched partitions are carried over; only affected rewritten."""
        import pandas as pd
        import ray.data as rd

        from archbloom_ray.pipelines import merge_upsert, write_keyed_store

        rng = np.random.default_rng(61)
        base = pd.DataFrame({
            "k": np.arange(300, dtype=np.int64),
            "v": rng.integers(0, 100, 300).astype(np.int64),
        })
        upd = pd.DataFrame({
            "k": np.arange(250, 350, dtype=np.int64),  # 50 update + 50 insert
            "v": rng.integers(100, 200, 100).astype(np.int64),
        })
        s1 = str(tmp_path / "v1")
        s2 = str(tmp_path / "v2")
        write_keyed_store(rd.from_arrow(pa.Table.from_pandas(base)).repartition(4),
                          s1, "k", num_partitions=8)
        n_rewritten = merge_upsert(
            s1, rd.from_arrow(pa.Table.from_pandas(upd)), s2, "k",
            num_partitions=8)
        assert 0 < n_rewritten <= 8
        got = (rd.read_parquet(s2).to_pandas()[["k", "v"]]
               .sort_values("k").reset_index(drop=True))
        want = (pd.concat([base[~base["k"].isin(upd["k"])], upd])
                .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


class TestCheckpointedShardedBloom:
    FACTORY = staticmethod(lambda: __import__(
        "archbloom_ray.sketches", fromlist=["BloomFilter"]
    ).BloomFilter(600, 0.01, name="ck"))

    def _docs(self):
        import ray.data as rd

        import pyarrow.parquet as pq
        from conftest import SF_DIR

        return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["text"]).repartition(4)

    def test_fresh_run_equals_unchekpointed(self, ray_session, tmp_path):
        from archbloom_ray.pipelines.build import (
            assemble_sharded_bloom,
            build_sharded_bloom_states,
            build_sketch,
        )
        from archbloom_ray.pipelines.checkpoint import (
            checkpointed_sharded_bloom,
        )

        ds = self._docs()
        states, report = checkpointed_sharded_bloom(
            ds, "text", self.FACTORY, str(tmp_path / "ck"),
            num_shards=7, batch_size=128)
        assert report["built_shards"] == report["total_shards"]
        ref = build_sharded_bloom_states(ds, "text", self.FACTORY,
                                         num_shards=7, batch_size=128)
        got = assemble_sharded_bloom(states, self.FACTORY, num_shards=7)
        want = build_sketch(ds, "text", self.FACTORY)
        assert got.to_bytes() == want.to_bytes()
        # every non-zero shard byte-matches the uncheckpointed build
        for s, b in ref.items():
            assert states[s] == b

    def test_resume_skips_done_shards(self, ray_session, tmp_path):
        import ray.data as rd

        from archbloom_ray.pipelines.build import assemble_sharded_bloom
        from archbloom_ray.pipelines.checkpoint import (
            checkpointed_sharded_bloom,
        )

        ck = str(tmp_path / "ck")
        ds = self._docs()
        states1, r1 = checkpointed_sharded_bloom(
            ds, "text", self.FACTORY, ck, num_shards=7, batch_size=128)
        # resume over an EMPTY dataset: all shards done ⇒ no scan work
        # needed, and the full result must still come back from disk
        empty = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
        states2, r2 = checkpointed_sharded_bloom(
            empty, "text", self.FACTORY, ck, num_shards=7, batch_size=128)
        assert r2["resumed_shards"] == r2["total_shards"]
        assert r2["built_shards"] == 0
        assert states2 == states1

    def test_torn_state_fails_closed_and_rebuilds(self, ray_session,
                                                  tmp_path):
        from archbloom_ray.pipelines.checkpoint import (
            checkpointed_sharded_bloom,
        )

        ck = str(tmp_path / "ck")
        ds = self._docs()
        states1, _ = checkpointed_sharded_bloom(
            ds, "text", self.FACTORY, ck, num_shards=7, batch_size=128)
        victim = sorted(k for k, v in states1.items() if any(v))[0]
        with open(f"{ck}/part-{victim}.state", "wb") as f:
            f.write(b"\x00" * 3)  # torn write
        states2, r2 = checkpointed_sharded_bloom(
            ds, "text", self.FACTORY, ck, num_shards=7, batch_size=128)
        assert r2["built_shards"] == 1
        assert states2 == states1
