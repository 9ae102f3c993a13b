"""Misra-Gries heavy-hitters: bound, merge, serialization, distributed."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import MisraGries, sketch_from_bytes


def _zipf_stream(n, n_keys=5000, seed=0):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n).clip(max=n_keys)
    return [f"key{r}" for r in ranks]


class TestBound:
    def test_guarantee_single_pass(self):
        stream = _zipf_stream(200_000)
        mg = MisraGries(64)
        for lo in range(0, len(stream), 8192):
            mg.update_arrow(pa.array(stream[lo:lo+8192], type=pa.string()))
        import collections
        exact = collections.Counter(stream)
        bound = mg.error_bound()
        assert mg.n == len(stream)
        # every estimate is a lower bound within `bound` of truth
        for key, est in mg.candidates():
            true = exact[key.decode()]
            assert est <= true <= est + bound, (key, est, true, bound)
        # every key heavier than the bound is present
        present = {k.decode() for k, _ in mg.candidates()}
        for key, cnt in exact.items():
            if cnt > bound:
                assert key in present, (key, cnt, bound)

    def test_merge_preserves_bound(self):
        stream = _zipf_stream(100_000, seed=1)
        import collections
        exact = collections.Counter(stream)
        parts = [stream[i::4] for i in range(4)]
        sketches = []
        for p in parts:
            mg = MisraGries(64)
            mg.update_arrow(pa.array(p, type=pa.string()))
            sketches.append(mg)
        acc = sketches[0]
        for s in sketches[1:]:
            acc.merge(s)
        bound = acc.error_bound()
        assert acc.n == len(stream)
        for key, est in acc.candidates():
            true = exact[key.decode()]
            assert est <= true <= est + bound

    def test_incompatible_merge(self):
        a, b = MisraGries(8), MisraGries(16)
        with pytest.raises(Exception):
            a.merge(b)


class TestSerde:
    def test_roundtrip(self):
        mg = MisraGries(16)
        mg.update_arrow(pa.array(["a"] * 10 + ["b"] * 5 + ["c"], type=pa.string()))
        back = sketch_from_bytes(mg.to_bytes())
        assert isinstance(back, MisraGries)
        assert back.n == mg.n and back.k == mg.k
        assert back.candidates() == mg.candidates()
        assert back.estimate("a") == 10


class TestDistributed:
    def test_grouped_heavy_domains(self, ray_session):
        import ray.data
        from archbloom_ray.pipelines.build import build_grouped_sketches, grouped_to_dict
        from archbloom_ray.datagen import pages_fixture
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        path = pages_fixture(20_000, seed=42)
        ds = ray.data.read_parquet(path, columns=["url", "lang"])

        def dom(batch):
            return pa.table({"lang": batch["lang"],
                             "domain": pc.list_element(pc.split_pattern(batch["url"], "/"), 2)})

        per_lang = grouped_to_dict(build_grouped_sketches(
            ds.map_batches(dom, batch_format="pyarrow", zero_copy_batch=True),
            "lang", "domain", lambda: MisraGries(32), salt=4))
        # exact oracle
        t = pq.read_table(path, columns=["url", "lang"])
        doms = pc.list_element(pc.split_pattern(t["url"], "/"), 2)
        import collections
        exact = collections.defaultdict(collections.Counter)
        for lang, d in zip(t["lang"].to_pylist(), doms.to_pylist()):
            exact[lang][d] += 1
        for lang, mg in per_lang.items():
            bound = mg.error_bound()
            for key, est in mg.candidates()[:5]:
                true = exact[lang][key.decode()]
                assert est <= true <= est + bound, (lang, key, est, true, bound)
            # the top exact domain must be present in the summary
            top_dom, top_cnt = exact[lang].most_common(1)[0]
            if top_cnt > bound:
                assert top_dom.encode() in dict(mg.candidates())
