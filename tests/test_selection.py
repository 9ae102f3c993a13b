"""DSIR importance weights + the distributed linear-classifier trainer."""
import numpy as np

from archbloom_ray.stages.selection import (dsir_weights,
                                            train_linear_classifier)


def _corpus(rd):
    # target docs (is_t=1) overuse the token "quantum"; raw-only docs don't
    rows = []
    for d in range(4):
        rows.append({"doc_id": d, "is_t": 1,
                     "text": "quantum quantum flux node alpha"})
    for d in range(4, 8):
        rows.append({"doc_id": d, "is_t": 0,
                     "text": "mundane filler words node alpha"})
    # a raw doc that LOOKS like the target domain
    rows.append({"doc_id": 8, "is_t": 0,
                 "text": "quantum quantum flux node alpha"})
    return rd.from_items(rows)


class TestDsirWeights:
    def test_target_like_doc_outranks(self, ray_session):
        import ray.data as rd

        out = {r["doc_id"]: r for r in dsir_weights(
            _corpus(rd), "text", "doc_id", "is_t").take_all()}
        assert len(out) == 9
        assert all(r["n_toks"] == 5 for r in out.values())
        # the target-looking raw doc must outweigh every mundane raw doc
        assert all(out[8]["sum_logw_u"] > out[d]["sum_logw_u"]
                   for d in range(4, 8))
        # identical texts get identical weights
        assert out[8]["sum_logw_u"] == out[0]["sum_logw_u"]

    def test_bucketed_variant_deterministic_and_close(self, ray_session):
        import ray.data as rd

        a = {r["doc_id"]: r["sum_logw_u"] for r in dsir_weights(
            _corpus(rd), "text", "doc_id", "is_t", buckets=4096).take_all()}
        b = {r["doc_id"]: r["sum_logw_u"] for r in dsir_weights(
            _corpus(rd), "text", "doc_id", "is_t", buckets=4096).take_all()}
        assert a == b  # keyed hashing, no RNG: run-invariant
        # with far more buckets than distinct tokens collisions are
        # unlikely -> same values as the exact-vocabulary variant
        exact = {r["doc_id"]: r["sum_logw_u"] for r in dsir_weights(
            _corpus(rd), "text", "doc_id", "is_t").take_all()}
        assert a == exact

    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        out = {r["doc_id"]: r["sum_logw_u"] for r in dsir_weights(
            _corpus(rd), "text", "doc_id", "is_t").take_all()}
        # brute-force reference
        docs = {d: ("quantum quantum flux node alpha"
                    if d in (0, 1, 2, 3, 8) else
                    "mundane filler words node alpha") for d in range(9)}
        tgt = set(range(4))
        cr: dict[str, int] = {}
        ct: dict[str, int] = {}
        for d, t in docs.items():
            for w in t.split():
                cr[w] = cr.get(w, 0) + 1
                if d in tgt:
                    ct[w] = ct.get(w, 0) + 1
        CR, CT, V = sum(cr.values()), sum(ct.values()), len(cr)
        expect = {}
        for d, t in docs.items():
            s = 0
            for w in t.split():
                s += int(np.floor(1_000_000 * np.log(
                    ((ct.get(w, 0) + 1.0) * (CR + V))
                    / ((cr[w] + 1.0) * (CT + V))) + 0.5))
            expect[d] = s
        assert out == expect


class TestLinearClassifier:
    def _sep(self, rd, repeat=1):
        # linearly separable: y=1 iff x1 > 5 (x2 is noise-free constant)
        rows = []
        for r in range(repeat):
            for i in range(10):
                rows.append({"rid": r * 10 + i, "y": 1 if i > 5 else 0,
                             "x0": 1, "x1": i, "x2": 2})
        return rd.from_items(rows)

    def test_learns_separable_data(self, ray_session):
        import ray.data as rd

        res = train_linear_classifier(
            self._sep(rd, repeat=20), ["x0", "x1", "x2"], "y",
            iters=12, lr_den=1)
        assert res["n"] == 200
        assert res["n_correct"] >= 175  # decisively better than chance

    def test_deterministic_across_partitionings(self, ray_session):
        import ray.data as rd

        a = train_linear_classifier(
            self._sep(rd, repeat=8), ["x0", "x1", "x2"], "y", iters=3)
        b = train_linear_classifier(
            self._sep(rd, repeat=8).repartition(7), ["x0", "x1", "x2"], "y",
            iters=3)
        assert a == b  # integer gradient sums: partitioning-invariant

    def test_trunc_div_matches_duckdb_semantics(self):
        from archbloom_ray.stages.selection import _trunc_div

        assert _trunc_div(-7, 2) == -3   # DuckDB BIGINT // truncates
        assert _trunc_div(7, 2) == 3
        assert _trunc_div(-1, 5) == 0


class TestKCenter:
    def _brute(self, vecs: dict[int, list[float]], k: int):
        import numpy as np

        ids = sorted(vecs)
        chosen = [min(ids)]
        dists = [0.0]
        dmin = {i: float(np.sum((np.array(vecs[i]) -
                                 np.array(vecs[chosen[0]])) ** 2))
                for i in ids}
        while len(chosen) < k:
            rest = [i for i in ids if i not in chosen]
            if not rest:
                break
            best = max(rest, key=lambda i: (dmin[i], -i))
            chosen.append(best)
            dists.append(dmin[best])
            for i in ids:
                d = float(np.sum((np.array(vecs[i]) -
                                  np.array(vecs[best])) ** 2))
                dmin[i] = min(dmin[i], d)
        return chosen, dists

    VECS = {
        10: [0.0, 0.0], 11: [0.1, 0.0], 12: [10.0, 0.0],
        13: [0.0, 10.0], 14: [10.0, 10.0], 15: [5.0, 5.0],
        16: [0.2, 0.1], 17: [9.9, 9.8],
    }

    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from archbloom_ray.stages.selection import kcenter_select

        ds = rd.from_items(
            [{"vec_id": i, "embedding": v} for i, v in self.VECS.items()])
        out = kcenter_select(ds, "embedding", "vec_id", 5)
        ids, dists = self._brute(self.VECS, 5)
        assert out["vec_id"].to_pylist() == ids
        assert out["dist_sq"].to_pylist() == dists
        # the far corners get picked before the near-duplicates
        assert set(out["vec_id"].to_pylist()[:4]) <= {10, 12, 13, 14, 15}

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        from archbloom_ray.stages.selection import kcenter_select

        items = [{"vec_id": i, "embedding": v} for i, v in self.VECS.items()]
        a = kcenter_select(rd.from_items(items), "embedding", "vec_id", 4)
        b = kcenter_select(rd.from_items(items).repartition(5),
                           "embedding", "vec_id", 4)
        assert a.equals(b)

    def test_exact_duplicate_vectors_still_fill_k(self, ray_session):
        import ray.data as rd

        from archbloom_ray.stages.selection import kcenter_select

        vecs = {1: [0.0, 0.0], 2: [0.0, 0.0], 3: [1.0, 1.0]}
        out = kcenter_select(
            rd.from_items([{"vec_id": i, "embedding": v}
                           for i, v in vecs.items()]),
            "embedding", "vec_id", 3)
        ids, dists = self._brute(vecs, 3)
        assert out["vec_id"].to_pylist() == ids == [1, 3, 2]
        assert out["dist_sq"].to_pylist() == dists  # dup enters at dist 0
