"""t-digest and KLL rank-error bound tests vs exact numpy/duckdb oracles."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from archbloom_ray.sketches import TDigest, KLLSketch, SketchError

QS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def _rank_error(values: np.ndarray, estimate: float, q: float) -> float:
    """Distance from q to the estimate's rank interval in the exact data.

    Tied values occupy a rank interval [left, right]; an estimate inside
    a tie run has zero error if q falls in that interval (the estimate
    IS a correct q-quantile).
    """
    s = np.sort(values)
    left = np.searchsorted(s, estimate, side="left") / len(s)
    right = np.searchsorted(s, estimate, side="right") / len(s)
    return max(0.0, left - q, q - right)


def _datasets():
    rng = np.random.default_rng(42)
    return {
        "uniform": rng.uniform(0, 1000, 100_000),
        "lognormal": rng.lognormal(3, 2, 100_000),
        "skewed-int": rng.zipf(1.5, 100_000).astype(np.float64),
    }


class TestTDigest:
    @pytest.mark.parametrize("name", list(_datasets()))
    def test_rank_error(self, name):
        data = _datasets()[name]
        td = TDigest(compression=200)
        for chunk in np.array_split(data, 7):
            td.update_arrow(chunk)
        for q in QS:
            err = _rank_error(data, td.quantile(q), q)
            assert err <= 0.01, (name, q, err)
        # tails must be tight (the point of the k1 scale function)
        for q in (0.001, 0.999):
            assert _rank_error(data, td.quantile(q), q) <= 0.003, (name, q)

    def test_merge_within_tolerance(self):
        data = _datasets()["lognormal"]
        parts = np.array_split(data, 9)
        digests = []
        for p in parts:
            t = TDigest(compression=200)
            t.update_arrow(p)
            digests.append(t)
        acc = digests[0]
        for d in digests[1:]:
            acc.merge(d)
        assert acc.total_weight == pytest.approx(len(data))
        for q in QS:
            assert _rank_error(data, acc.quantile(q), q) <= 0.015, q

    def test_update_weighted_matches_unit_updates(self):
        """The count-row grouped-build path: (value, count) weighted
        updates must estimate like the expanded unit-weight stream."""
        rng = np.random.default_rng(5)
        vals = rng.integers(0, 500, size=400).astype(np.float64)
        uniq, cnt = np.unique(vals, return_counts=True)
        tw = TDigest(compression=200)
        tw.update_weighted(uniq, cnt)
        tu = TDigest(compression=200)
        tu.update_arrow(vals)
        assert tw.total_weight == pytest.approx(len(vals))
        expanded = np.sort(vals)
        for q in QS:
            assert _rank_error(expanded, tw.quantile(q), q) <= 0.02, q
        # weighted ∘ merge stays coherent
        tw.merge(tu)
        assert tw.total_weight == pytest.approx(2 * len(vals))
        assert _rank_error(expanded, tw.quantile(0.5), 0.5) <= 0.02

    def test_update_weighted_skips_invalid(self):
        td = TDigest(compression=200)
        td.update_weighted(np.array([1.0, np.nan, 3.0]), np.array([2, 5, 0]))
        assert td.total_weight == pytest.approx(2.0)

    def test_two_way_merge_immediate_query(self):
        """Regression: a 2-way merge stays under the size threshold, so
        compression must still be forced (unsorted centroids otherwise)."""
        rng = np.random.default_rng(1)
        lo, hi = rng.uniform(0, 100, 20_000), rng.uniform(900, 1000, 20_000)
        a, b = TDigest(200), TDigest(200)
        a.update_arrow(hi)  # deliberately out of global order
        b.update_arrow(lo)
        a.merge(b)
        qs = [a.quantile(q) for q in (0.1, 0.5, 0.9)]
        assert qs == sorted(qs)  # monotone
        both = np.concatenate([lo, hi])
        for q, est in zip((0.1, 0.5, 0.9), qs):
            assert _rank_error(both, est, q) <= 0.01

    def test_min_max_and_edges(self):
        td = TDigest(compression=100)
        data = np.arange(1, 1001, dtype=np.float64)
        td.update_arrow(data)
        assert td.quantile(0.0) == pytest.approx(1.0, abs=1.0)
        assert td.quantile(1.0) == pytest.approx(1000.0, abs=1.0)
        assert td.quantile(0.5) == pytest.approx(500.0, rel=0.02)

    def test_against_duckdb(self):
        data = _datasets()["uniform"]
        td = TDigest(200)
        td.update_arrow(data)
        med = duckdb.arrow(pa.table({"v": data})).aggregate(
            "quantile_cont(v, 0.5) AS m"
        ).fetchone()[0]
        assert td.quantile(0.5) == pytest.approx(med, rel=0.01)

    def test_empty_and_single(self):
        td = TDigest(100)
        assert np.isnan(td.quantile(0.5))
        td.update_arrow(np.array([42.0]))
        assert td.quantile(0.5) == 42.0

    def test_serde(self):
        td = TDigest(150)
        td.update_arrow(_datasets()["uniform"][:10_000])
        r = TDigest.from_bytes(td.to_bytes())
        assert r.quantile(0.5) == pytest.approx(td.quantile(0.5))
        assert r.total_weight == td.total_weight

    def test_compression_bound(self):
        td = TDigest(compression=100)
        td.update_arrow(_datasets()["lognormal"])
        td._compress()
        assert td.means.size <= 2 * td.compression


class TestKLL:
    @pytest.mark.parametrize("name", list(_datasets()))
    def test_rank_error(self, name):
        data = _datasets()[name]
        kll = KLLSketch(k=200)
        for chunk in np.array_split(data, 7):
            kll.update_arrow(chunk)
        for q in QS:
            err = _rank_error(data, kll.quantile(q), q)
            assert err <= 2.9 / 200 * 2, (name, q, err)

    def test_merge_within_tolerance(self):
        data = _datasets()["uniform"]
        parts = np.array_split(data, 9)
        sks = []
        for i, p in enumerate(parts):
            s = KLLSketch(k=200, seed=i)
            s.update_arrow(p)
            sks.append(s)
        acc = sks[0]
        for s in sks[1:]:
            acc.merge(s)
        assert acc.n == len(data)
        for q in QS:
            assert _rank_error(data, acc.quantile(q), q) <= 0.03, q

    def test_space_bound(self):
        kll = KLLSketch(k=200)
        kll.update_arrow(_datasets()["uniform"])
        retained = sum(l.size for l in kll.levels)
        assert retained <= 3 * 200 + 8 * len(kll.levels)

    def test_update_weighted_matches_unit_updates(self):
        """Bit-decomposition weighted insert estimates like the
        expanded unit-weight stream (same rank-error regime)."""
        rng = np.random.default_rng(7)
        vals = rng.integers(0, 300, size=500).astype(np.float64)
        uniq, cnt = np.unique(vals, return_counts=True)
        kw = KLLSketch(k=200)
        kw.update_weighted(uniq, cnt)
        assert kw.n == len(vals)
        expanded = np.sort(vals)
        for q in QS:
            assert _rank_error(expanded, kw.quantile(q), q) <= 0.05, q
        # weighted ∘ merge stays coherent
        ku = KLLSketch(k=200)
        ku.update_arrow(vals)
        kw.merge(ku)
        assert kw.n == 2 * len(vals)
        assert _rank_error(expanded, kw.quantile(0.5), 0.5) <= 0.05

    def test_update_weighted_skips_invalid(self):
        kll = KLLSketch(k=64)
        kll.update_weighted(np.array([1.0, np.nan, 3.0]), np.array([2, 5, 0]))
        assert kll.n == 2

    def test_rank_query(self):
        kll = KLLSketch(k=200)
        data = np.arange(10_000, dtype=np.float64)
        kll.update_arrow(data)
        assert kll.rank(5000.0) == pytest.approx(0.5, abs=0.03)

    def test_deterministic_given_seed(self):
        a, b = KLLSketch(k=128, seed=9), KLLSketch(k=128, seed=9)
        data = _datasets()["lognormal"][:20_000]
        a.update_arrow(data)
        b.update_arrow(data)
        assert a.quantile(0.5) == b.quantile(0.5)

    def test_serde(self):
        kll = KLLSketch(k=128)
        kll.update_arrow(_datasets()["uniform"][:30_000])
        r = KLLSketch.from_bytes(kll.to_bytes())
        assert r.n == kll.n
        assert r.quantile(0.5) == kll.quantile(0.5)

    def test_validation(self):
        with pytest.raises(SketchError):
            KLLSketch(k=4)
        with pytest.raises(SketchError):
            KLLSketch(k=128).merge(KLLSketch(k=64))


class TestDDSketch:
    """DDSketch relative-error guarantee (Masson et al. VLDB'19):
    |est - x_r| <= alpha * |x_r| for the value x_r at the target rank,
    deterministically, as long as the answer is outside the collapsed
    pool."""

    @pytest.mark.parametrize("name", list(_datasets()))
    def test_relative_error_guarantee(self, name):
        from archbloom_ray.sketches import DDSketch

        data = _datasets()[name]
        dd = DDSketch(alpha=0.01, max_bins=4096)
        for chunk in np.array_split(data, 7):
            dd.update_arrow(chunk)
        s = np.sort(data)
        for q in QS + [0.001, 0.999]:
            rank = int(np.floor(q * (len(s) - 1)))
            true = s[rank]
            est = dd.quantile(q)
            assert not dd.last_collapsed
            assert abs(est - true) <= dd.alpha * abs(true) + 1e-12, (name, q)

    def test_merge_is_exact_and_order_independent(self):
        from archbloom_ray.sketches import DDSketch

        data = _datasets()["lognormal"]
        parts = np.array_split(data, 9)

        def build(order):
            sks = []
            for p in parts:
                d = DDSketch(alpha=0.02)
                d.update_arrow(p)
                sks.append(d)
            acc = DDSketch(alpha=0.02)
            for i in order:
                acc.merge(sks[i])
            return acc

        single = DDSketch(alpha=0.02)
        single.update_arrow(data)
        fwd = build(range(9))
        rev = build(range(8, -1, -1))
        assert fwd.count == rev.count == single.count == len(data)
        # bucket-exact: merged state identical to the one-pass build
        np.testing.assert_array_equal(fwd.pos.counts, single.pos.counts)
        np.testing.assert_array_equal(rev.pos.counts, single.pos.counts)
        assert fwd.pos.lo == rev.pos.lo == single.pos.lo
        for q in QS:
            assert fwd.quantile(q) == rev.quantile(q) == single.quantile(q)

    def test_update_weighted_matches_unit_updates(self):
        from archbloom_ray.sketches import DDSketch

        vals = np.array([3.0, 7.0, 3.0, 100.0, 7.0, 3.0])
        a = DDSketch(alpha=0.01)
        a.update_arrow(vals)
        b = DDSketch(alpha=0.01)
        b.update_weighted(np.array([3.0, 7.0, 100.0]), np.array([3, 2, 1]))
        np.testing.assert_array_equal(a.pos.counts, b.pos.counts)
        assert a.pos.lo == b.pos.lo

    def test_zeros_and_negatives(self):
        from archbloom_ray.sketches import DDSketch

        data = np.array([-50.0, -5.0, 0.0, 0.0, 1.0, 10.0, 200.0])
        dd = DDSketch(alpha=0.01)
        dd.update_arrow(data)
        assert dd.count == 7
        assert dd.zero_count == 2
        s = np.sort(data)
        for q in QS:
            rank = int(np.floor(q * (len(s) - 1)))
            true = s[rank]
            est = dd.quantile(q)
            assert abs(est - true) <= dd.alpha * abs(true) + 1e-12, (q, est, true)

    def test_collapse_keeps_upper_quantiles(self):
        from archbloom_ray.sketches import DDSketch

        rng = np.random.default_rng(7)
        data = rng.lognormal(0, 4, 50_000)  # huge dynamic range
        dd = DDSketch(alpha=0.01, max_bins=768)
        dd.update_arrow(data)
        assert dd.pos.collapsed
        assert dd.pos.counts.size <= 768
        s = np.sort(data)
        for q in (0.95, 0.99, 0.999):
            rank = int(np.floor(q * (len(s) - 1)))
            true = s[rank]
            est = dd.quantile(q)
            assert not dd.last_collapsed, q
            assert abs(est - true) <= dd.alpha * abs(true) + 1e-12, q
        # a deep-low quantile lands in the pool and says so
        dd.quantile(0.0)
        assert dd.last_collapsed

    def test_serde_roundtrip(self):
        from archbloom_ray.sketches import DDSketch
        from archbloom_ray.sketches.base import sketch_from_bytes

        dd = DDSketch(alpha=0.015, max_bins=512, name="lens")
        dd.update_arrow(np.array([-3.0, 0.0, 1.5, 88.0, 1e6]))
        r = sketch_from_bytes(dd.to_bytes())
        assert isinstance(r, DDSketch)
        assert r.count == dd.count and r.zero_count == dd.zero_count
        np.testing.assert_array_equal(r.pos.counts, dd.pos.counts)
        np.testing.assert_array_equal(r.neg.counts, dd.neg.counts)
        assert r.pos.lo == dd.pos.lo and r.neg.lo == dd.neg.lo
        for q in QS:
            assert r.quantile(q) == dd.quantile(q)

    def test_validation(self):
        from archbloom_ray.sketches import DDSketch

        with pytest.raises(SketchError):
            DDSketch(alpha=0.0)
        with pytest.raises(SketchError):
            DDSketch(alpha=1.5)
        with pytest.raises(SketchError):
            DDSketch(alpha=0.01).merge(DDSketch(alpha=0.02))
        with pytest.raises(SketchError):
            DDSketch().quantile(0.5)  # empty
