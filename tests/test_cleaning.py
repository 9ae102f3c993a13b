"""Corpus-cleaning stages: duplicate_spans and boilerplate_segments
verified against tiny brute-force Python oracles."""
import numpy as np
import pytest

from archbloom_ray.stages.cleaning import boilerplate_segments, duplicate_spans


def _brute_dup_spans(docs: dict[int, str], n: int) -> dict[int, tuple[int, int]]:
    """{doc: (n_windows, n_dup_windows)} over lowercased word n-grams."""
    grams: dict[int, list[tuple[str, ...]]] = {}
    for d, t in docs.items():
        toks = [w.lower() for w in t.strip().split()]
        grams[d] = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    owners: dict[tuple[str, ...], set[int]] = {}
    for d, gs in grams.items():
        for g in gs:
            owners.setdefault(g, set()).add(d)
    return {
        d: (len(gs), sum(1 for g in gs if len(owners[g]) >= 2))
        for d, gs in grams.items() if gs
    }


class TestDuplicateSpans:
    DOCS = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "a different opening then the quick brown fox jumps over it",
        3: "completely unrelated words with no shared window at all here",
        4: "short doc",  # < n tokens: no windows, no output row
        5: "the quick brown fox jumps over the lazy dog tonight",  # exact dup of 1
    }

    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        ds = rd.from_items(
            [{"doc_id": d, "text": t} for d, t in self.DOCS.items()])
        got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
               for r in duplicate_spans(ds, "text", "doc_id", n=5).take_all()}
        assert got == _brute_dup_spans(self.DOCS, 5)

    def test_exact_dup_is_fully_duplicated(self, ray_session):
        import ray.data as rd

        ds = rd.from_items(
            [{"doc_id": d, "text": t} for d, t in self.DOCS.items()])
        got = {r["doc_id"]: r for r in
               duplicate_spans(ds, "text", "doc_id", n=5).take_all()}
        assert got[1]["n_dup_windows"] == got[1]["n_windows"] == 6
        assert got[5]["n_dup_windows"] == got[5]["n_windows"] == 6
        assert got[3]["n_dup_windows"] == 0
        assert 4 not in got  # 2 tokens -> no 5-gram windows

    def test_within_doc_repeat_not_duplicated(self, ray_session):
        import ray.data as rd

        # the same 3-gram twice in ONE doc is not a cross-doc duplicate
        docs = {1: "x y z pad1 pad2 x y z", 2: "u v w other things here"}
        ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs.items()])
        got = {r["doc_id"]: r for r in
               duplicate_spans(ds, "text", "doc_id", n=3).take_all()}
        assert got[1]["n_dup_windows"] == 0
        assert got == {d: {"doc_id": d, "n_windows": v[0], "n_dup_windows": v[1]}
                       for d, v in _brute_dup_spans(docs, 3).items()}


class TestBoilerplateSegments:
    def _ds(self, rd, docs):
        return rd.from_items(
            [{"doc_id": d, "text": t, "source": s} for d, (t, s) in docs.items()])

    def test_in_source_repeat_is_stripped(self, ray_session):
        import ray.data as rd

        banner = "subscribe our newsletter"  # one 3-word segment
        docs = {
            1: (f"{banner} alpha beta gamma", "siteA"),
            2: (f"{banner} delta epsilon zeta", "siteA"),
            3: (f"{banner} eta theta iota", "siteB"),  # only once in siteB
        }
        out = {r["doc_id"]: r for r in boilerplate_segments(
            self._ds(rd, docs), "text", "doc_id", "source",
            words_per_seg=3, min_docs=2).take_all()}
        assert out[1]["n_segs"] == 2 and out[1]["n_boiler"] == 1
        assert out[1]["text_clean"] == "alpha beta gamma"
        assert out[2]["text_clean"] == "delta epsilon zeta"
        # same banner under a DIFFERENT source stays (frequency is in-domain)
        assert out[3]["n_boiler"] == 0
        assert out[3]["text_clean"] == f"{banner} eta theta iota"

    def test_all_boiler_doc_yields_null(self, ray_session):
        import ray.data as rd

        docs = {
            1: ("nav bar text", "s"),
            2: ("nav bar text", "s"),
            3: ("real content here plus more words", "s"),
        }
        out = {r["doc_id"]: r for r in boilerplate_segments(
            self._ds(rd, docs), "text", "doc_id", "source",
            words_per_seg=3, min_docs=2).take_all()}
        assert out[1]["text_clean"] is None and out[1]["n_boiler"] == 1
        assert out[3]["n_boiler"] == 0
        assert out[3]["text_clean"] == "real content here plus more words"

    def test_min_docs_threshold(self, ray_session):
        import ray.data as rd

        docs = {
            1: ("repeat me now tail one", "s"),
            2: ("repeat me now tail two", "s"),
            3: ("repeat me now tail three", "s"),
        }
        # min_docs=4: nothing qualifies
        out = {r["doc_id"]: r for r in boilerplate_segments(
            self._ds(rd, docs), "text", "doc_id", "source",
            words_per_seg=3, min_docs=4).take_all()}
        assert all(r["n_boiler"] == 0 for r in out.values())
        # min_docs=3: the shared leading segment goes
        out3 = {r["doc_id"]: r for r in boilerplate_segments(
            self._ds(rd, docs), "text", "doc_id", "source",
            words_per_seg=3, min_docs=3).take_all()}
        assert all(r["n_boiler"] == 1 for r in out3.values())
        assert out3[1]["text_clean"] == "tail one"


class TestCooccurrence:
    def test_matches_brute_force(self, ray_session):
        import itertools

        import ray.data as rd

        from archbloom_ray.stages.graph import cooccurrence_pairs

        docs = {
            1: "alpha beta gamma alpha",      # dup token: distinct per doc
            2: "beta gamma delta",
            3: "alpha beta epsilon",
            4: "zeta eta",
        }
        counts: dict[tuple[str, str], int] = {}
        for t in docs.values():
            for a, b in itertools.combinations(sorted(set(t.split())), 2):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        ds = rd.from_items(
            [{"doc_id": d, "text": t} for d, t in docs.items()])
        out = cooccurrence_pairs(ds, "text", "doc_id", k=50)
        got = [((r["t1"], r["t2"]), r["n_docs"]) for r in out.to_pylist()]
        assert got == expect
        assert (("beta", "gamma"), 2) in got  # co-occurs in docs 1 and 2


class TestRemoveDuplicateSpans:
    def test_removal_matches_brute_force(self, ray_session):
        import ray.data as rd

        from archbloom_ray.stages.cleaning import remove_duplicate_spans

        shared = "one two three four five"          # a full 5-gram
        docs = {
            1: f"{shared} unique tail here now",
            2: f"other opening words {shared}",
            3: "no duplicated window in this document at all",
            4: "tiny doc",                          # <5 tokens: no windows
        }

        def brute(docs, n=5):
            grams = {}
            for d, t in docs.items():
                toks = t.split()
                grams[d] = [tuple(toks[i:i + n])
                            for i in range(len(toks) - n + 1)]
            owners = {}
            for d, gs in grams.items():
                for g in gs:
                    owners.setdefault(g, set()).add(d)
            out = {}
            for d, t in docs.items():
                toks = t.split()
                cov = [False] * len(toks)
                for i, g in enumerate(grams[d]):
                    if len(owners[g]) >= 2:
                        for j in range(i, i + n):
                            cov[j] = True
                keep = [tok for tok, c in zip(toks, cov) if not c]
                out[d] = (len(toks), sum(cov),
                          " ".join(keep) if keep else None)
            return out

        ds = rd.from_items(
            [{"doc_id": d, "text": t} for d, t in docs.items()])
        got = {r["doc_id"]: (r["n_toks"], r["n_removed"], r["text_clean"])
               for r in remove_duplicate_spans(
                   ds, "text", "doc_id", n=5).take_all()}
        assert got == brute(docs)
        # the shared 5-gram vanished from both owners, the rest survived
        assert got[1][2] == "unique tail here now"
        assert got[2][2] == "other opening words"
        assert got[3] == (8, 0, docs[3])
        assert got[4] == (2, 0, docs[4])

    def test_identical_docs_fully_removed(self, ray_session):
        import ray.data as rd

        from archbloom_ray.stages.cleaning import remove_duplicate_spans

        t = "a b c d e f g"
        ds = rd.from_items([{"doc_id": 1, "text": t},
                            {"doc_id": 2, "text": t}])
        got = {r["doc_id"]: r for r in remove_duplicate_spans(
            ds, "text", "doc_id", n=5).take_all()}
        for d in (1, 2):
            assert got[d]["n_removed"] == 7
            assert got[d]["text_clean"] is None
