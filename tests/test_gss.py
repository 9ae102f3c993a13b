"""GroupSizeSampler (CIDR'19 sketch+sample group-by estimates)."""

import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches.base import SketchError, sketch_from_bytes
from archbloom_ray.sketches.gss import GroupSizeSampler


def _zipfish(seed=5):
    rng = np.random.default_rng(seed)
    keys = np.concatenate([
        np.char.add("s", np.arange(50_000).astype(str)),   # singletons
        np.repeat(np.char.add("m", np.arange(500).astype(str)), 10),
        np.repeat(np.char.add("h", np.arange(20).astype(str)), 5000),
    ])
    return keys[rng.permutation(keys.size)], 50_520, 50_000


class TestGroupSizeSampler:
    def test_estimates(self):
        keys, D, singles = _zipfish()
        g = GroupSizeSampler(1024, 12)
        for chunk in np.array_split(keys, 23):
            g.update_arrow(pa.array(chunk))
        assert g.rows == keys.size
        assert abs(g.n_groups() - D) / D <= 3 * g.n_groups_error_bound()
        # the paper's point: singleton-group share from a GROUP sample
        true_frac = singles / D
        assert abs(g.frac_groups_le(1) - true_frac) \
            <= 3 * g.sample_error_bound()
        # a 1%-row-sample baseline would see ~500 of 50k singletons;
        # the group sample nails the count within a few percent
        assert abs(g.groups_le(1) - singles) / singles < 0.10

    def test_merge_equals_oneshot_bitwise(self):
        keys, _, _ = _zipfish(9)
        parts = []
        for chunk in np.array_split(keys, 16):
            t = GroupSizeSampler(1024, 12)
            t.update_arrow(pa.array(chunk))
            parts.append(t)
        m = parts[0]
        for t in parts[1:]:
            m = m.merge(t)
        one = GroupSizeSampler(1024, 12)
        one.update_arrow(pa.array(keys))
        # bottom-k property: merged sample + EXACT counts == one-shot
        assert np.array_equal(m.hashes, one.hashes)
        assert np.array_equal(m.counts, one.counts)
        assert m.rows == one.rows

    def test_sample_counts_exact(self):
        # every sampled key's count matches its true multiplicity
        keys, _, _ = _zipfish(2)
        g = GroupSizeSampler(256, 12)
        for chunk in np.array_split(keys, 7):
            g.update_arrow(pa.array(chunk))
        from archbloom_ray.hashing import mmh3_128_batch

        uniq, true_counts = np.unique(keys, return_counts=True)
        h1, _ = mmh3_128_batch(pa.array(uniq))
        by_hash = dict(zip(h1.astype(np.uint64).tolist(),
                           true_counts.tolist()))
        for h, c in zip(g.hashes.tolist(), g.counts.tolist()):
            assert by_hash[h] == c

    def test_serde_and_guards(self):
        keys, _, _ = _zipfish(3)
        g = GroupSizeSampler(128, 10)
        g.update_arrow(pa.array(keys[:10_000]))
        h = sketch_from_bytes(g.to_bytes())
        assert np.array_equal(h.hashes, g.hashes)
        assert np.array_equal(h.counts, g.counts)
        assert h.rows == g.rows and h.n_groups() == g.n_groups()
        with pytest.raises(SketchError):
            GroupSizeSampler(4)
        with pytest.raises(SketchError):
            g.merge(GroupSizeSampler(64, 10))
