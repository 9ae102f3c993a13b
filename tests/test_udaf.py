"""Sketches as native Ray Data aggregations (pipelines/udaf.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from ray.data.aggregate import Count

from archbloom_ray.pipelines import HLLDistinct, SketchAgg, SketchQuantile
from archbloom_ray.pipelines.build import build_sketch
from archbloom_ray.sketches import BloomFilter, HyperLogLog
from archbloom_ray.sketches.base import sketch_from_bytes


@pytest.fixture(scope="module")
def docs(ray_session):
    rng = np.random.default_rng(7)
    n = 4000
    langs = rng.choice(["en", "de", "fr"], size=n, p=[0.7, 0.2, 0.1])
    # duplicates on purpose: value space smaller than row count
    texts = [f"{l}-doc-{rng.integers(0, 600)}" for l in langs]
    chars = rng.integers(10, 1000, size=n)
    table = pa.table({"lang": pa.array(langs), "text": pa.array(texts),
                      "n_chars": pa.array(chars, pa.int64())})
    return rd.from_arrow(table).repartition(8), table


def test_whole_dataset_hll_equals_build_sketch(docs):
    ds, table = docs
    est = ds.aggregate(HLLDistinct("text", p=14))["hll_distinct(text)"]
    ref = build_sketch(ds, "text", lambda: HyperLogLog(14)).cardinality()
    # register-max merge is order-independent: identical estimate
    assert est == pytest.approx(ref, abs=1e-9)
    exact = len(set(table["text"].to_pylist()))
    assert abs(est - exact) <= max(3 * 1.04 / 2 ** 7 * exact, 4.0)


def test_grouped_hll_with_builtin_count(docs):
    ds, table = docs
    rows = ds.groupby("lang").aggregate(
        Count(), HLLDistinct("text", p=12)).take_all()
    by_lang = {}
    for lang, text in zip(table["lang"].to_pylist(),
                          table["text"].to_pylist()):
        by_lang.setdefault(lang, set()).add(text)
    assert {r["lang"] for r in rows} == set(by_lang)
    for r in rows:
        exact = len(by_lang[r["lang"]])
        bound = max(3 * 1.04 / 2 ** 6 * exact, 4.0)
        assert abs(r["hll_distinct(text)"] - exact) <= bound
        assert r["count()"] == sum(
            1 for l in table["lang"].to_pylist() if l == r["lang"])


def test_generic_sketch_agg_returns_state_bytes(docs):
    ds, table = docs
    out = ds.aggregate(SketchAgg(
        "text", lambda: BloomFilter(5000, 0.01), alias_name="bf"))
    bf = sketch_from_bytes(out["bf"])
    assert bf.lookup_batch(table["text"].combine_chunks()).all()
    absent = pa.array([f"missing-{i}" for i in range(2000)])
    fpr = bf.lookup_batch(absent).mean()
    assert fpr < 0.05


def test_quantile_aggs_within_rank_tolerance(docs):
    ds, table = docs
    out = ds.aggregate(SketchQuantile("n_chars", 0.5),
                       SketchQuantile("n_chars", 0.9, kind="kll"))
    vals = np.asarray(table["n_chars"], dtype=np.float64)
    for key, q in [("tdigest_q0.5(n_chars)", 0.5), ("kll_q0.9(n_chars)", 0.9)]:
        est = out[key]
        # rank tolerance: the estimate's rank sits within ±2% of q
        rank = (vals <= est).mean()
        assert abs(rank - q) <= 0.02, (key, est, rank)


def test_topk_items_exact_when_capacity_covers(docs):
    from archbloom_ray.pipelines import TopKItems

    ds, table = docs
    out = ds.aggregate(TopKItems("lang", 3, capacity=50))
    got = out["top3(lang)"]
    import collections
    exact = collections.Counter(table["lang"].to_pylist())
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(e["item"], e["count"]) for e in got] == want


def test_topk_counts_within_mg_bound_when_capacity_tight(docs):
    from archbloom_ray.pipelines import TopKItems

    ds, table = docs
    cap = 8
    out = ds.aggregate(TopKItems("text", 5, capacity=cap))
    import collections
    exact = collections.Counter(table["text"].to_pylist())
    n = len(table)
    for e in out["top5(text)"]:
        true = exact[e["item"]]
        # MG estimate is a lower bound within N/capacity of truth
        assert true - n / cap <= e["count"] <= true


def test_dataset_profile_one_call(docs):
    from archbloom_ray.pipelines import dataset_profile

    ds, table = docs
    prof = dataset_profile(ds, {"n_chars": "numeric", "lang": "string"},
                           topk=2, quantiles=(0.5,))
    vals = np.asarray(table["n_chars"], dtype=np.float64)
    assert prof["count()"] == len(table)
    assert prof["min(n_chars)"] == vals.min()
    assert prof["max(n_chars)"] == vals.max()
    assert prof["sum(n_chars)"] == vals.sum()
    est = prof["tdigest_q0.5(n_chars)"]
    assert abs((vals <= est).mean() - 0.5) <= 0.02
    assert abs(prof["hll_distinct(lang)"] - 3) <= 4.0
    assert len(prof["top2(lang)"]) == 2


def test_topk_int_keys_come_back_as_canonical_strings(ray_session):
    from archbloom_ray.pipelines import TopKItems

    table = pa.table({"k": pa.array([7, 7, 7, 3, 3, 9], pa.int64())})
    out = rd.from_arrow(table).aggregate(TopKItems("k", 2, capacity=16))
    assert [(e["item"], e["count"]) for e in out["top2(k)"]] == \
        [("7", 3), ("3", 2)]


def test_profile_with_nulls_in_numeric_column(ray_session):
    from archbloom_ray.pipelines import dataset_profile

    table = pa.table({
        "v": pa.array([1, None, 5, None, 9], pa.int64()),
        "s": pa.array(["a", "b", "a", None, "c"]),
    })
    prof = dataset_profile(rd.from_arrow(table).repartition(3),
                           {"v": "numeric", "s": "string"},
                           topk=2, quantiles=(0.5,))
    assert prof["count()"] == 5          # rows, not non-null values
    assert prof["min(v)"] == 1 and prof["max(v)"] == 9
    assert prof["sum(v)"] == 15          # nulls ignored
    assert abs(prof["hll_distinct(s)"] - 3) <= 1.0  # null skipped


def test_empty_groups_and_nulls_are_skipped(ray_session):
    table = pa.table({
        "k": pa.array(["a", "a", "b", "b"]),
        "v": pa.array(["x", None, None, None]),
    })
    rows = rd.from_arrow(table).groupby("k").aggregate(
        HLLDistinct("v", p=10)).take_all()
    got = {r["k"]: r["hll_distinct(v)"] for r in rows}
    assert got["a"] == pytest.approx(1.0, abs=0.5)
    # all-null group: empty sketch -> estimate 0
    assert got["b"] == pytest.approx(0.0, abs=0.5)


def test_new_sketches_drop_into_sketchagg(ray_session):
    """The session-8 sketches are ordinary Sketch subclasses, so the
    generic SketchAgg wrapper distributes them with no extra code."""
    import numpy as np

    from archbloom_ray.pipelines.udaf import SketchAgg
    from archbloom_ray.sketches import DynamicDistinct, ReqSketch

    vals = np.arange(10_000, dtype=np.float64)
    keys = np.where(np.arange(10_000) % 2 == 0, "a", "b")
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(4)

    rows = ds.groupby("k").aggregate(
        SketchAgg("v", lambda: ReqSketch(32),
                  finalize=lambda sk: sk.quantile(0.99),
                  alias_name="p99")).take_all()
    got = {r["k"]: r["p99"] for r in rows}
    # per-group p99 of evens/odds in [0, 10000): near 9900
    assert abs(got["a"] - 9900) <= 200 and abs(got["b"] - 9900) <= 200

    keys2 = pa.array([f"u{i % 737}" for i in range(5_000)])
    est = rd.from_arrow(pa.table({"u": keys2})).repartition(3).aggregate(
        SketchAgg("u", lambda: DynamicDistinct(4096),
                  finalize=lambda sk: sk.estimate(),
                  alias_name="d"))["d"]
    assert abs(est - 737) / 737 <= 0.10


def test_counting_qf_as_native_aggregation(docs):
    """The factory-generic SketchAgg carries the counting quotient
    filter through Ray's native aggregation path: per-group states
    merge by counter-add and the finalized counts are EXACT."""
    import collections

    from archbloom_ray.sketches import CountingQuotientFilter
    from archbloom_ray.sketches.base import sketch_from_bytes

    ds, table = docs
    rows = ds.groupby("lang").aggregate(
        SketchAgg("text", lambda: CountingQuotientFilter(4096,
                                                         fpr=2.0 ** -40),
                  alias_name="cqf_state")).take_all()
    exact = collections.defaultdict(collections.Counter)
    for lang, text in zip(table["lang"].to_pylist(),
                          table["text"].to_pylist()):
        exact[lang][text] += 1
    assert {r["lang"] for r in rows} == set(exact)
    for r in rows:
        sk = sketch_from_bytes(r["cqf_state"])
        cnt = exact[r["lang"]]
        assert sk.total() == sum(cnt.values())
        import pyarrow as pa
        keys = sorted(cnt)
        got = sk.count_batch(pa.array(keys, type=pa.string()))
        assert list(got) == [cnt[k] for k in keys]
