"""Independent spec vectors for the shared-derivation oracles
(VERDICT r3 item 2).

The driver's hash-compare certifies that the Ray pipeline and its
DuckDB twin agree — but when both sides SHARE a derivation (the
derived partsupp arithmetic, the URL canonicalization regexes), a
spec bug hash-matches right past it.  These tests pin each derivation
to a third source: hand-written vector files in ``tests/data/`` and a
deliberately scalar re-implementation transcribed from the documented
rule, never from the production code.
"""

import json
import pathlib

import duckdb
import numpy as np
import pyarrow as pa
import pytest

DATA = pathlib.Path(__file__).parent / "data"


# -- URL canonicalization -------------------------------------------------

def _url_vectors():
    return json.loads(
        (DATA / "url_canonical_vectors.json").read_text())["vectors"]


def test_canonical_urls_rfc_vectors():
    from archbloom_ray.stages.url import canonical_urls

    vecs = _url_vectors()
    got = canonical_urls(pa.array([v["in"] for v in vecs])).to_pylist()
    bad = [f"{v['in']!r}: got {g!r}, want {v['out']!r} ({v['why']})"
           for v, g in zip(vecs, got) if g != v["out"]]
    assert not bad, "\n".join(bad)


def test_canonical_urls_sql_twin_matches_vectors():
    """The DuckDB twin used by the url_canonical_dedup oracle must
    reproduce the SAME hand-written expectations (certifies the SQL
    side independently of the Ray side)."""
    from archbloom_ray.queries import _canon_url_sql

    vecs = _url_vectors()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)",
                    [(v["in"],) for v in vecs])
    got = dict(con.execute(
        f"SELECT url, curl FROM {_canon_url_sql('t')} f").fetchall())
    bad = [f"{v['in']!r}: got {got.get(v['in'])!r}, want {v['out']!r} "
           f"({v['why']})"
           for v in vecs if got.get(v["in"]) != v["out"]]
    assert not bad, "\n".join(bad)


# -- derived partsupp -----------------------------------------------------

def _partsupp_rows_spec(p: int, s_cnt: int):
    """Scalar transcription of the documented rule (plain Python ints,
    no numpy) — the third implementation."""
    out = []
    for i in range(4):
        sk = (p + i * (s_cnt // 4 + p // s_cnt)) % s_cnt
        avail = (p * (i + 1)) % 9999 + 1
        cost = (7 * p + 3 * sk) % 99900 + 100
        out.append((sk, avail, cost))
    return out


def _cases():
    return json.loads((DATA / "partsupp_vectors.json").read_text())["cases"]


def test_partsupp_hand_vectors_match_spec_loop():
    """The pencil-and-paper vectors agree with the scalar transcription
    (guards the vector file itself against arithmetic slips)."""
    for c in _cases():
        rows = _partsupp_rows_spec(c["p"], c["s_cnt"])
        assert [r[0] for r in rows] == c["suppkey"], c
        assert [r[1] for r in rows] == c["availqty"], c
        assert [r[2] for r in rows] == c["cost_cents"], c


def test_partsupp_slots_match_hand_vectors():
    from archbloom_ray.queries import _partsupp_slots

    for c in _cases():
        sk, avail, cost = _partsupp_slots(
            np.array([c["p"]], dtype=np.int64), c["s_cnt"])
        assert sk[0].tolist() == c["suppkey"], c
        assert avail[0].tolist() == c["availqty"], c
        assert cost[0].tolist() == c["cost_cents"], c


def test_partsupp_slots_match_spec_loop_randomized():
    from archbloom_ray.queries import _partsupp_slots

    rng = np.random.default_rng(7)
    for s_cnt in (7, 10, 13, 64, 997):
        pk = np.unique(rng.integers(0, 1 << 21, 200)).astype(np.int64)
        sk, avail, cost = _partsupp_slots(pk, s_cnt)
        for j, p in enumerate(pk.tolist()):
            rows = _partsupp_rows_spec(p, s_cnt)
            assert sk[j].tolist() == [r[0] for r in rows], (p, s_cnt)
            assert avail[j].tolist() == [r[1] for r in rows], (p, s_cnt)
            assert cost[j].tolist() == [r[2] for r in rows], (p, s_cnt)


# -- planted BPE merge table (q_bpe_merges oracle) ------------------------

EOW = "▁"


def _sennrich_get_stats(vocab):
    pairs = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] = pairs.get(p, 0) + freq
    return pairs


def _sennrich_merge_vocab(pair, vocab):
    a, b = pair
    out = {}
    for syms, freq in vocab.items():
        new, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                new.append(a + b)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + freq
    return out


def _sennrich_train(words_counts, num_merges):
    """BPE trainer transcribed from Sennrich et al. 2016 Fig. 1
    pseudocode (full recount each round — no incremental maintenance),
    written independently of stages/bpe.py."""
    vocab = {tuple(w) + (EOW,): c for w, c in words_counts}
    merges = []
    for _ in range(num_merges):
        pairs = {p: w for p, w in _sennrich_get_stats(vocab).items()
                 if w > 0}
        if not pairs:
            break
        best_w = max(pairs.values())
        best = min(p for p, w in pairs.items() if w == best_w)
        merges.append(best)
        vocab = _sennrich_merge_vocab(best, vocab)
    return merges


def _planted_bpe_word_counts():
    wc = []
    for k in range(24):
        word = "".join("abcd"[(k >> s) & 3] for s in (4, 2, 0))
        wc.append((word, (7 * k) % 19 + 2))
    return wc


def test_planted_bpe_oracle_table_matches_sennrich():
    """The literal merge table frozen in the bpe_merges oracle SQL is
    exactly what the independently transcribed Sennrich trainer
    derives from the planted word counts.  First three merges also
    hand-checked: ('a','c') w=76, ('b','▁') w=75, ('a','▁') w=71."""
    import duckdb as _d

    from archbloom_ray.queries import oracle_sql

    ref = _sennrich_train(_planted_bpe_word_counts(), 24)
    # first rounds pinned by hand (independent of BOTH implementations)
    assert ref[:3] == [("a", "c"), ("b", EOW), ("a", EOW)]

    sql = oracle_sql()["bpe_merges"]
    con = _d.connect()
    con.execute("CREATE VIEW documents AS "
                "SELECT i AS doc_id FROM range(24) t(i)")
    rows = con.execute(sql).fetchall()
    got = [(r[1], r[2]) for r in sorted(rows)]
    assert got == ref


def test_planted_bpe_trainer_parity():
    import numpy as np

    from archbloom_ray.stages.bpe import bpe_train

    wc = _planted_bpe_word_counts()
    ref = _sennrich_train(wc, 24)
    got = bpe_train([w for w, _ in wc],
                    np.array([c for _, c in wc], dtype=np.int64), 24)
    assert got == ref


# -- planted k-center trace (q_kcenter_diverse oracle) --------------------

def _planted_kcenter_points(n):
    """Scalar derivation of the planted geometry (transcribed from the
    query docstring's rule, not the numpy code)."""
    pts = []
    for vid in range(n):
        c = vid % 8
        j = (vid // 8) % 2
        v = [0.0] * 9
        v[c] = (c + 1) * 1000.0
        v[8] = j * 600.0
        pts.append((vid, tuple(v)))
    return pts


def _greedy_kcenter_spec(pts, k):
    """Scalar farthest-point greedy: seed = min id, argmax dmin with
    min-id tie-break — the documented contract, re-implemented with
    plain Python floats."""
    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ids = [i for i, _ in pts]
    vec = dict(pts)
    sel = [(0, min(ids), 0.0)]
    chosen = {min(ids)}
    dmin = {i: d2(vec[i], vec[min(ids)]) for i in ids}
    for rank in range(1, k):
        best = max((d, -i) for i, d in dmin.items() if i not in chosen)
        pick = -best[1]
        sel.append((rank, pick, best[0]))
        chosen.add(pick)
        for i in ids:
            dmin[i] = min(dmin[i], d2(vec[i], vec[pick]))
    coverage = max(dmin.values())
    return sel, coverage


def test_planted_kcenter_oracle_rows_match_spec_trace():
    """The literal trace frozen in the kcenter_diverse oracle SQL is
    exactly what the scalar greedy derivation produces, at several
    corpus sizes (dup positions must not change the trace)."""
    import duckdb as _d

    from archbloom_ray.queries import oracle_sql

    expected = [(0, 0, 0), (1, 15, 65360000), (2, 14, 50360000),
                (3, 13, 37360000), (4, 12, 26360000), (5, 11, 17360000),
                (6, 10, 10360000), (7, 9, 5360000)]
    for n in (16, 24, 500):
        sel, coverage = _greedy_kcenter_spec(_planted_kcenter_points(n), 8)
        assert [(r, i, int(d)) for r, i, d in sel] == expected, n
        assert int(coverage) == 360000, n

    sql = oracle_sql()["kcenter_diverse"]
    con = _d.connect()
    con.execute("CREATE VIEW embeddings AS "
                "SELECT i AS vec_id FROM range(500) t(i)")
    rows = sorted(con.execute(sql).fetchall())
    assert [(r[0], r[1], r[2]) for r in rows] == expected
    assert all(r[3] == 360000 for r in rows)


def test_planted_semdedup_geometry_margins():
    """The semdedup planting's safety margins: identical positions at
    cosine 1.0 (> 0.95, dropped), every cross-position pair ≤
    1000/√1250000 ≈ 0.894 (< 0.95, kept) — checked exhaustively over
    the 24 distinct planted positions with plain Python math."""
    import math

    pos = {}
    for c in range(8):
        for j in range(3):
            v = [0.0] * 10
            v[c] = 1000.0
            if j == 1:
                v[8] = 500.0
            if j == 2:
                v[9] = 500.0
            pos[(c, j)] = v

    keys = sorted(pos)
    for a in range(len(keys)):
        for b in range(a + 1, len(keys)):
            va, vb = pos[keys[a]], pos[keys[b]]
            dot = sum(x * y for x, y in zip(va, vb))
            cos = dot / (math.sqrt(sum(x * x for x in va))
                         * math.sqrt(sum(x * x for x in vb)))
            assert cos < 0.90, (keys[a], keys[b], cos)


def test_partsupp_cte_matches_spec_loop():
    """The SQL twin (_PARTSUPP_CTE) derives the same table as the
    scalar spec loop over a synthetic part/supplier pair — certifies
    the DuckDB side without touching the numpy side."""
    from archbloom_ray.queries import _PARTSUPP_CTE

    n_part, s_cnt = 37, 10
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS "
                f"SELECT i AS p_partkey FROM range({n_part}) t(i)")
    con.execute(f"CREATE VIEW supplier AS "
                f"SELECT i AS s_suppkey FROM range({s_cnt}) t(i)")
    got = con.execute(
        _PARTSUPP_CTE
        + "SELECT ps_partkey, ps_suppkey, ps_availqty, ps_cost_cents "
          "FROM partsupp ORDER BY ps_partkey, ps_suppkey, ps_availqty"
    ).fetchall()
    want = sorted(
        (p, sk, avail, cost)
        for p in range(n_part)
        for sk, avail, cost in _partsupp_rows_spec(p, s_cnt))
    assert got == [tuple(map(int, r)) for r in want]
