"""Property-based tests (hypothesis) for the vectorized batch kernels —
random unicode inputs vs straightforward scalar references."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60),
    min_size=0, max_size=12)


def _shingle_set(t: str, width: int) -> set:
    b = t.encode("utf-8")
    if len(b) < width:
        b = b + b" " * (width - len(b))
    return {b[i:i + width] for i in range(len(b) - width + 1)}


@settings(max_examples=60, deadline=None)
@given(texts)
def test_packed_shingles_match_scalar_sets(docs):
    from archbloom_ray.stages.dedup import _packed_shingles_batch

    flat, counts = _packed_shingles_batch(
        pa.array(docs, type=pa.string()), 5)
    assert len(counts) == len(docs)
    pos = 0
    for i, t in enumerate(docs):
        got = set(flat[pos: pos + counts[i]].tolist())
        expect = {int.from_bytes(s, "big") for s in _shingle_set(t or "", 5)}
        assert got == expect, t
        pos += counts[i]


@settings(max_examples=60, deadline=None)
@given(texts)
def test_window_hashes_distinct_counts(docs):
    """Byte-window kernel: per-doc distinct count equals the scalar
    distinct windows (hash collisions would only ever shrink it, and at
    these sizes are effectively impossible)."""
    from archbloom_ray.stages.dedup import window_hashes_batch

    width = 4
    flat, counts = window_hashes_batch(pa.array(docs, type=pa.string()), width)
    assert len(counts) == len(docs)
    for i, t in enumerate(docs):
        b = (t or "").encode("utf-8")
        expect = (len({b[j:j + width] for j in range(len(b) - width + 1)})
                  if len(b) >= width else 0)
        assert counts[i] == expect, t


@settings(max_examples=60, deadline=None)
@given(texts, st.integers(min_value=1, max_value=4))
def test_token_ngrams_match_scalar(docs, n):
    import re

    from archbloom_ray.stages.text import token_ngrams_flat

    grams, idx = token_ngrams_flat(pa.array(docs, type=pa.string()), n)
    got: dict[int, list] = {}
    for g, d in zip(grams.to_pylist(), idx.tolist()):
        got.setdefault(d, []).append(g)

    for i, t in enumerate(docs):
        t = t or ""
        stripped = t.strip()
        toks = [x.lower() for x in re.split(r"\s+", stripped)] if stripped else [""]
        expect = ["\x1f".join(toks[j: j + n]) for j in range(len(toks) - n + 1)]
        assert got.get(i, []) == expect, (t, n)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=400),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip(samples, rate):
    from archbloom_ray.stages import decode_wav, encode_wav

    pcm = np.array(samples, dtype=np.int16)
    mono, r = decode_wav(encode_wav(pcm, rate))
    assert r == rate
    assert np.allclose(mono * 32768.0, pcm.astype(np.float32))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=20), min_size=0, max_size=50),
       st.lists(st.text(max_size=20), min_size=0, max_size=50))
def test_kmv_exact_below_k_properties(a_vals, b_vals):
    from archbloom_ray.sketches import KMVSketch

    a, b = KMVSketch(256), KMVSketch(256)
    if a_vals:
        a.update_arrow(pa.array(a_vals, type=pa.string()))
    if b_vals:
        b.update_arrow(pa.array(b_vals, type=pa.string()))
    sa, sb = set(a_vals), set(b_vals)
    assert round(a.cardinality()) == len(sa)
    assert round(a.union_estimate(b)) == len(sa | sb)
    assert round(a.intersection_estimate(b)) == len(sa & sb)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=2, max_size=25),
       st.sampled_from([(1, 4), (3, 10), (1, 2), (4, 5)]))
def test_ngram_exact_pairs_prefix_filter_complete(ray_session, docs, thr):
    """Adversarial alphabet ('ab ' → massive shared-shingle mass):
    PPJoin prefix filtering must still find EVERY pair ≥ threshold."""
    import ray.data as rd

    from archbloom_ray.stages import ngram_jaccard_exact_pairs

    num, den = thr
    ids = [f"d{i:03d}" for i in range(len(docs))]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "g": pa.array(["x"] * len(docs)),
        "text": pa.array(docs)}))
    got = {(r["id_a"], r["id_b"]): (r["n_common"], r["n_union"])
           for r in ngram_jaccard_exact_pairs(
               ds, "text", "doc_id", "g", width=5,
               min_num=num, min_den=den).take_all()}

    def sh(t):
        b = t.encode()
        if len(b) < 5:
            b = b + b" " * (5 - len(b))
        return {b[i:i + 5] for i in range(len(b) - 4)}

    expect = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sh(docs[i]), sh(docs[j])
            c, u = len(a & b), len(a | b)
            if den * c >= num * u:
                expect[(ids[i], ids[j])] = (c, u)
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=300),
       st.integers(min_value=0, max_value=10))
def test_ddsketch_relative_error_property(vals, split_seed):
    """Random values, random split into partial sketches: the merged
    DDSketch must satisfy |est - x_r| <= alpha*|x_r| at every decile
    AND equal the single-pass build bucket-for-bucket."""
    from archbloom_ray.sketches import DDSketch

    data = np.asarray(vals, dtype=np.float64)
    rng = np.random.default_rng(split_seed)
    parts = np.array_split(data[rng.permutation(data.size)],
                           min(4, data.size))
    merged = DDSketch(alpha=0.02)
    for p in parts:
        d = DDSketch(alpha=0.02)
        d.update_arrow(p)
        merged.merge(d)
    single = DDSketch(alpha=0.02)
    single.update_arrow(data)
    np.testing.assert_array_equal(merged.pos.counts, single.pos.counts)
    np.testing.assert_array_equal(merged.neg.counts, single.neg.counts)
    assert merged.zero_count == single.zero_count
    s = np.sort(data)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        r = int(np.floor(q * (len(s) - 1)))
        true = float(s[r])
        est = merged.quantile(q)
        if not merged.last_collapsed:
            assert abs(est - true) <= 0.02 * abs(true) + 1e-9, (q, est, true)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=24), min_size=0, max_size=200))
def test_xor_filter_no_false_negative_property(keys):
    """Any key multiset: every inserted key answers present."""
    from archbloom_ray.sketches import XorFilter

    col = pa.array(keys, type=pa.string())
    f = XorFilter.build_arrow(col)
    if len(keys):
        assert f.lookup_batch(col).all()
    assert f.n == len(set(k.encode() for k in keys))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=20), min_size=0, max_size=150),
       st.lists(st.text(max_size=20), min_size=0, max_size=150))
def test_sparse_hll_merge_equals_single_pass(a_vals, b_vals):
    """Sparse-HLL pair-union merge == one-pass build over the union,
    register-exact, in either merge order."""
    from archbloom_ray.sketches import SparseHLL

    a = SparseHLL(10)
    a.update_arrow(pa.array(a_vals, type=pa.string()))
    b = SparseHLL(10)
    b.update_arrow(pa.array(b_vals, type=pa.string()))
    ab = SparseHLL.from_bytes(a.to_bytes()).merge(b)
    ba = SparseHLL.from_bytes(b.to_bytes()).merge(a)
    single = SparseHLL(10)
    single.update_arrow(pa.array(a_vals + b_vals, type=pa.string()))
    np.testing.assert_array_equal(ab._registers(), single._registers())
    np.testing.assert_array_equal(ba._registers(), single._registers())


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=20), min_size=0, max_size=50),
       st.lists(st.text(max_size=20), min_size=0, max_size=50),
       st.lists(st.text(max_size=20), min_size=0, max_size=50))
def test_theta_exact_set_algebra_properties(a_vals, b_vals, c_vals):
    """Below k every theta estimator is exact, so the full set algebra
    must agree with Python sets — including composed expressions and
    the inclusion–exclusion identity |A| = |A∩B| + |A\\B|."""
    from archbloom_ray.sketches import ThetaSketch

    sks = []
    for vals in (a_vals, b_vals, c_vals):
        s = ThetaSketch(256)
        if vals:
            s.update_arrow(pa.array(vals, type=pa.string()))
        sks.append(s)
    a, b, c = sks
    sa, sb, sc = set(a_vals), set(b_vals), set(c_vals)
    assert round(a.cardinality()) == len(sa)
    assert round(a.union_estimate(b)) == len(sa | sb)
    assert round(a.intersection_estimate(b)) == len(sa & sb)
    assert round(a.a_not_b_estimate(b)) == len(sa - sb)
    assert (round(a.intersection_estimate(b)) + round(a.a_not_b_estimate(b))
            == len(sa))
    # composed derived-sketch expression: (A ∩ B) \ C
    assert round(a.intersect(b).a_not_b(c).cardinality()) == len((sa & sb) - sc)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.text(max_size=12), min_size=0, max_size=40),
                min_size=1, max_size=5),
       st.permutations(range(5)))
def test_theta_merge_order_independent_property(shards, order):
    """Any merge order over any sharding yields byte-identical state to
    the one-pass build (k small enough that trims actually fire)."""
    from archbloom_ray.sketches import ThetaSketch

    one = ThetaSketch(16)
    for vals in shards:
        if vals:
            one.update_arrow(pa.array(vals, type=pa.string()))
    parts = []
    for vals in shards:
        s = ThetaSketch(16)
        if vals:
            s.update_arrow(pa.array(vals, type=pa.string()))
        parts.append(s)
    idx = [i for i in order if i < len(parts)]
    m = parts[idx[0]]
    for i in idx[1:]:
        m.merge(parts[i])
    assert m.to_bytes() == one.to_bytes()


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=-10**12, max_value=10**12),
                min_size=1, max_size=300),
       st.integers(min_value=2, max_value=64))
def test_selection_quantiles_match_sorted_interpolation(
        ray_session, vals, buckets):
    """quantiles_by_selection must equal the sorted-array quantile_cont
    (a*(1-frac)+b*frac) for ANY int column and ANY bucket count —
    including duplicate-heavy and single-value inputs."""
    import ray.data as rd

    from archbloom_ray.pipelines.relational import quantiles_by_selection

    qs = [0.0, 0.37, 0.5, 0.91, 1.0]
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    got = quantiles_by_selection(ds, "x", qs, buckets=buckets)
    sv = np.sort(np.asarray(vals, dtype=np.int64))
    n = len(sv)
    want = []
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        frac = h - lo
        if frac == 0.0 or lo + 1 >= n:
            want.append(float(sv[lo]))
        else:
            want.append(float(sv[lo]) * (1 - frac) + float(sv[lo + 1]) * frac)
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),      # user
                          st.integers(0, 20),     # ts
                          st.floats(-100, 100, allow_nan=False)),
                min_size=1, max_size=120),
       st.integers(min_value=1, max_value=6))
def test_rolling_median_matches_bruteforce(ray_session, rows, window):
    import ray.data as rd

    from archbloom_ray.pipelines.relational import rolling_median_k

    tbl = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    got = {r["event_id"]: r["roll_median"]
           for r in rolling_median_k(rd.from_arrow(tbl), "user_id", "ts",
                                     "value", "event_id",
                                     window=window).take_all()}
    per_user: dict[int, list] = {}
    for eid, (u, ts, v) in enumerate(rows):
        per_user.setdefault(u, []).append((ts, eid, v))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        for i in range(len(evs)):
            w = sorted(v for _, _, v in evs[max(0, i - window + 1): i + 1])
            c = len(w)
            want[evs[i][1]] = w[(c - 1) // 2] * 0.5 + w[c // 2] * 0.5
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["en", "de", "fr"]),
                          st.integers(min_value=-10**10, max_value=10**10)),
                min_size=1, max_size=200),
       st.integers(min_value=2, max_value=32))
def test_grouped_selection_quantiles_match_sorted(ray_session, rows, buckets):
    import ray.data as rd

    from archbloom_ray.pipelines.relational import (
        grouped_quantiles_by_selection)

    tbl = pa.table({"k": pa.array([r[0] for r in rows]),
                    "x": pa.array([r[1] for r in rows], pa.int64())})
    got = grouped_quantiles_by_selection(
        rd.from_arrow(tbl).repartition(3), "k", "x",
        [0.0, 0.5, 0.73, 1.0], buckets=buckets).to_pandas()
    got = got.sort_values("k", ignore_index=True)
    per = {}
    for k, x in rows:
        per.setdefault(k, []).append(x)
    for _, r in got.iterrows():
        sv = np.sort(np.asarray(per[r["k"]], dtype=np.int64))
        n = len(sv)
        for q, col in [(0.0, "q0_0"), (0.5, "q0_5"),
                       (0.73, "q0_73"), (1.0, "q1_0")]:
            h = q * (n - 1)
            lo = int(np.floor(h))
            frac = h - lo
            if frac == 0.0 or lo + 1 >= n:
                want = float(sv[lo])
            else:
                want = float(sv[lo]) * (1 - frac) + float(sv[lo + 1]) * frac
            assert r[col] == want, (r["k"], q)


@settings(max_examples=40, deadline=None)
@given(texts, st.integers(min_value=1, max_value=6))
def test_token_window_hash_matches_gram_identity(docs, n):
    """token_window_hash64 must induce EXACTLY the same equality
    partition as the gram strings: equal n-grams → equal hashes,
    distinct n-grams → distinct hashes (2^-64 collisions are
    practically unobservable at test sizes)."""
    from archbloom_ray.stages.text import token_ngrams_flat, token_window_hash64

    col = pa.array(docs, type=pa.string())
    h, di = token_window_hash64(col, n)
    g, dg = token_ngrams_flat(col, n)
    assert np.array_equal(di, dg)
    assert len(h) == len(g)
    seen: dict = {}
    rev: dict = {}
    for gram, hh in zip(g.to_pylist(), h.tolist()):
        assert seen.setdefault(gram, hh) == hh        # consistency
        assert rev.setdefault(hh, gram) == gram       # injectivity


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=64),
                min_size=1, max_size=250),
       st.integers(min_value=2, max_value=64))
def test_float_selection_quantiles_match_sorted(ray_session, vals, buckets):
    """Float selection must be bit-exact vs sorted-array quantile_cont
    over ANY doubles — subnormals, huge magnitudes, negatives, ±0."""
    import ray.data as rd

    from archbloom_ray.pipelines.relational import (
        float_quantiles_by_selection)

    qs = [0.0, 0.31, 0.5, 0.97, 1.0]
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    got = float_quantiles_by_selection(ds, "x", qs, buckets=buckets)
    sv = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(sv)
    want = []
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        frac = h - lo
        if frac == 0.0 or lo + 1 >= n:
            want.append(float(sv[lo]))
        else:
            want.append(float(sv[lo]) * (1 - frac) + float(sv[lo + 1]) * frac)
    assert got == want


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=50),
                min_size=1, max_size=15),
       st.integers(min_value=1, max_value=4))
def test_duplicate_spans_match_bruteforce(ray_session, docs, n):
    """duplicate_spans (token-window hashing) vs a scalar brute force:
    per-doc window totals and corpus-duplicated-window counts must
    match exactly on adversarially-shared vocab ('ab ')."""
    import re

    import ray.data as rd

    from archbloom_ray.stages.cleaning import duplicate_spans

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs, type=pa.string()),
    }))
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
           for r in duplicate_spans(ds, "text", "doc_id", n=n).take_all()}

    def grams(t):
        s = (t or "").strip()
        toks = [x.lower() for x in re.split(r"\s+", s)] if s else [""]
        return [tuple(toks[i: i + n]) for i in range(len(toks) - n + 1)]

    per_doc = {i: grams(t) for i, t in enumerate(docs)}
    docs_of: dict[tuple, set] = {}
    for i, gs in per_doc.items():
        for g in gs:
            docs_of.setdefault(g, set()).add(i)
    want = {}
    for i, gs in per_doc.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if len(docs_of[g]) >= 2)
        want[i] = (len(gs), dup)
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                     max_size=30), min_size=0, max_size=200),
    st.integers(min_value=1, max_value=5),
)
def test_scalable_bloom_properties(keys, n_splits):
    """SBF invariants under arbitrary batch splits: never a false
    negative, stage fills never exceed declared capacity, the
    single-writer bound telescopes under p0/(1−r), and items_added
    never exceeds the true distinct count."""
    from archbloom_ray.sketches import ScalableBloomFilter

    f = ScalableBloomFilter(8, 0.01)
    step = max(1, len(keys) // n_splits)
    for i in range(0, len(keys), step):
        f.update_arrow(pa.array(keys[i:i + step], type=pa.string()))
    if keys:
        assert f.lookup_batch(pa.array(keys, type=pa.string())).all()
    assert all(i <= c for i, c in zip(f.stage_items, f.stage_capacity))
    assert f.error_bound() <= 0.01 / (1 - 0.9) + 1e-9
    assert f.items_added() <= len(set(keys))


@settings(deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=60),
                          st.integers(min_value=0, max_value=500)),
                min_size=0, max_size=300),
       st.integers(min_value=0, max_value=500),
       st.integers(min_value=1, max_value=7))
def test_sliding_hll_window_registers_exact(events, cut, nsplits):
    """STRUCTURAL property, not a statistical bound: for any stream,
    any batch split, and any cutoff, the sliding HLL's window register
    file equals the brute-force per-register max rank over keys whose
    LAST occurrence is >= cutoff — the pareto lists lose nothing a
    window query can see."""
    import numpy as np
    import pyarrow as pa

    from archbloom_ray.hashing import mmh3_128_batch
    from archbloom_ray.sketches.hll import _clz64
    from archbloom_ray.sketches.slidinghll import SlidingHyperLogLog

    p = 6
    sk = SlidingHyperLogLog(p)
    vals = pa.array([f"k{k}" for k, _ in events], type=pa.string())
    times = np.array([t for _, t in events], dtype=np.int64)
    step = max(1, (len(events) + nsplits - 1) // nsplits)
    for i in range(0, len(events), step):
        sk.update_arrow(vals.slice(i, step), now=times[i:i + step])

    # brute force: last-seen per key, then HLL register maxima
    last = {}
    for k, t in events:
        last[k] = max(last.get(k, -(1 << 62)), t)
    keep = [k for k, t in last.items() if t >= cut]
    want = np.zeros(1 << p, dtype=np.uint8)
    if keep:
        h1, _ = mmh3_128_batch(pa.array([f"k{k}" for k in keep]))
        idx = (h1 >> np.uint64(64 - p)).astype(np.int64)
        rho = (np.minimum(_clz64(h1 << np.uint64(p)), 64 - p) + 1)
        np.maximum.at(want, idx, rho.astype(np.uint8))
    assert (sk.registers_since(cut) == want).all()


@given(st.lists(st.tuples(st.integers(0, 400),        # key id
                          st.sampled_from([1, 1, 1, -1])),  # op
                min_size=0, max_size=400),
       st.integers(min_value=1, max_value=7))
@settings(max_examples=40, deadline=None)
def test_dynamic_distinct_linear_property(ops, nsplits):
    """Strict-turnstile random insert/delete interleavings: the linear
    sketch's state equals the one-shot build over the SAME multiset
    (split/merge invariance — it's a sum), a delete is the exact
    inverse of an insert, and the estimate tracks the live distinct
    count within the bound."""
    import numpy as np
    import pyarrow as pa

    from archbloom_ray.sketches.dyndist import DynamicDistinct

    # enforce strict turnstile: drop deletes that would go negative
    bal: dict[int, int] = {}
    keys, signs = [], []
    for k, sg in ops:
        if sg < 0 and bal.get(k, 0) == 0:
            continue
        bal[k] = bal.get(k, 0) + sg
        keys.append(f"k{k}")
        signs.append(sg)
    live = sum(1 for v in bal.values() if v > 0)

    one = DynamicDistinct(4096)
    if keys:
        one.update_arrow(pa.array(keys),
                         signs=np.array(signs, dtype=np.int64))
    merged = DynamicDistinct(4096)
    step = max(1, (len(keys) + nsplits - 1) // nsplits)
    for i in range(0, len(keys), step):
        p = DynamicDistinct(4096)
        p.update_arrow(pa.array(keys[i:i + step]),
                       signs=np.array(signs[i:i + step], dtype=np.int64))
        merged.merge(p)
    assert np.array_equal(merged.cells, one.cells)
    est = one.estimate()
    assert abs(est - live) <= one.relative_error_bound() * live + 3
    # full retraction returns the zero state exactly
    undo = DynamicDistinct(4096)
    if keys:
        undo.update_arrow(pa.array(keys),
                          signs=-np.array(signs, dtype=np.int64))
    merged.merge(undo)
    assert not merged.cells.any()


@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=600),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=40, deadline=None)
def test_req_rank_properties(vals, nsplits):
    """REQ invariants on arbitrary inputs: n preserved across
    split+merge, quantiles monotone in q, every estimate is a value
    the sketch actually retained (no interpolation artifacts), and
    min/max exact."""
    import numpy as np

    from archbloom_ray.sketches.req import ReqSketch

    arr = np.array(vals, dtype=np.float64)
    sk = ReqSketch(32, seed=1)
    step = max(1, (arr.size + nsplits - 1) // nsplits)
    parts = []
    for i in range(0, arr.size, step):
        p = ReqSketch(32, seed=1)
        p.update_arrow(arr[i:i + step])
        parts.append(p)
    sk = parts[0]
    for p in parts[1:]:
        sk = sk.merge(p)
    assert sk.n == arr.size
    assert sk.min == arr.min() and sk.max == arr.max()
    qs = [0.0, 0.1, 0.5, 0.9, 0.999, 1.0]
    ests = sk.quantiles(qs)
    assert all(a <= b + 1e-12 for a, b in zip(ests, ests[1:]))
    # q<=0 / q>=1 answer from the exactly-tracked extremes (HRA
    # compaction routinely discards the minimum from the buffers);
    # interior estimates are values the sketch actually retained
    assert ests[0] == sk.min and ests[-1] == sk.max
    retained = set()
    for lvl in sk.levels:
        retained.update(lvl.buf.tolist())
    assert all(e in retained for e in ests[1:-1])


@given(st.lists(st.text(max_size=16), min_size=0, max_size=300),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=40, deadline=None)
def test_gss_merged_sample_counts_exact(keys, nsplits):
    """The bottom-k group sample's counts stay EXACT through any
    split+merge (the KMV containment argument), and rows totals add."""
    import numpy as np
    import pyarrow as pa

    from archbloom_ray.hashing import mmh3_128_batch
    from archbloom_ray.sketches.gss import GroupSizeSampler

    one = GroupSizeSampler(64, 10)
    if keys:
        one.update_arrow(pa.array(keys))
    merged = GroupSizeSampler(64, 10)
    step = max(1, (len(keys) + nsplits - 1) // nsplits)
    for i in range(0, len(keys), step):
        p = GroupSizeSampler(64, 10)
        p.update_arrow(pa.array(keys[i:i + step]))
        merged.merge(p)
    assert np.array_equal(merged.hashes, one.hashes)
    assert np.array_equal(merged.counts, one.counts)
    assert merged.rows == one.rows == len(keys)
    if keys:
        uniq, cnt = np.unique(np.array(keys, dtype=object), return_counts=True)
        h1, _ = mmh3_128_batch(pa.array(list(uniq)))
        truth = dict(zip(h1.astype(np.uint64).tolist(), cnt.tolist()))
        for h, c in zip(merged.hashes.tolist(), merged.counts.tolist()):
            assert truth[h] == c
