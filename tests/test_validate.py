"""Expectation gates: every rule kind exercised with planted violations."""
import pyarrow as pa

from archbloom_ray.pipelines.validate import expectations_report


class TestExpectations:
    def _ds(self, rd):
        return rd.from_items([
            {"k": 1, "s": "a",  "v": 5,  "w": 5},
            {"k": 2, "s": "",   "v": 50, "w": 50},   # empty string
            {"k": 2, "s": "b",  "v": -1, "w": 0},    # dup key, range, w!=v
            {"k": 3, "s": None, "v": 7,  "w": 7},    # null string
            {"k": 3, "s": "zz", "v": 8,  "w": 8},    # dup key, not in set
        ])

    def test_all_rule_kinds(self, ray_session):
        import ray.data as rd

        out = {r["rule"]: r["n_violations"] for r in expectations_report(
            self._ds(rd), [
                ("k_unique", "unique", "k"),
                ("s_nonempty", "nonempty", "s"),
                ("s_nonnull", "nonnull", "s"),
                ("v_range", "range", ("v", 0, 10)),
                ("s_in_set", "in_set", ("s", ["a", "b", ""])),
                ("v_eq_w", "cols_equal", ("v", "w")),
            ]).to_pylist()}
        assert out == {
            "k_unique": 2,     # two extra occurrences (k=2, k=3)
            "s_nonempty": 2,   # "" and None
            "s_nonnull": 1,
            "v_range": 2,      # -1 and 50
            "s_in_set": 1,     # only "zz" (None fills to '', which is allowed)
            "v_eq_w": 1,
        }

    def test_clean_table_passes(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([{"k": i, "v": i} for i in range(100)])
        out = {r["rule"]: r["n_violations"] for r in expectations_report(
            ds, [("k_unique", "unique", "k"),
                 ("v_range", "range", ("v", 0, 99))]).to_pylist()}
        assert out == {"k_unique": 0, "v_range": 0}

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        items = [{"k": i % 7, "v": i} for i in range(50)]
        rules = [("k_unique", "unique", "k"),
                 ("v_range", "range", ("v", 10, 60))]
        a = expectations_report(rd.from_items(items), rules)
        b = expectations_report(rd.from_items(items).repartition(9), rules)
        assert a.equals(b)
        assert a.to_pylist()[0]["n_violations"] == 43  # 50 - 7 distinct
