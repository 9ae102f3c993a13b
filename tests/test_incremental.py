"""Planted-duplicate coverage for the incremental-curation batch.

The driver's sf0.01 documents table has NO duplicate texts, so its
oracle rows for incremental_dedup / dup_cluster_sizes / dedup_keep_best
exercise only the all-novel path.  These tests run the SAME query
callables and oracle SQL over a synthetic documents.parquet with
duplicates planted across the old/new halves and across sources, so
the non-trivial branches (Bloom-positive confirmed dups, multi-copy
clusters, policy-vs-min-id divergence) are value-checked too.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    # long enough to pass increment_ingest_pipeline's 100-char gate
    pool = [f"text body number {i} with shared content " * 4 for i in range(18)]
    n = 60
    # duplicates within the old half, within the new half, and ACROSS
    texts = [pool[int(rng.integers(0, len(pool)))] for _ in range(n)]
    # policy divergence: same text, the LARGER id carries the smaller
    # source so keep-best disagrees with min-id on this cluster
    texts[3] = texts[45] = "planted cross-half duplicate"
    sources = [f"src{int(rng.integers(0, 6))}" for _ in range(n)]
    sources[3], sources[45] = "src5", "src0"
    tab = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    d = tmp_path_factory.mktemp("planted_docs")
    pq.write_table(tab, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def planted_ddb(planted_dir):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{planted_dir}/documents.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", [
    "incremental_dedup", "dup_cluster_sizes", "dedup_keep_best",
    "drift_ks_chars", "drift_chi2_source", "dedup_exact",
    "increment_ingest_pipeline",
])
def test_planted_duplicates_match_oracle(ray_session, planted_dir,
                                         planted_ddb, name):
    from archbloom_ray import queries as q

    got = q.queries()[name](planted_dir)
    if not isinstance(got, pa.Table):
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
    rdf = _norm(got.to_pandas() if isinstance(got, pa.Table) else got)
    odf = _norm(planted_ddb.sql(q.oracle_sql()[name]).df())
    assert list(rdf.columns) == list(odf.columns), name
    assert len(rdf) == len(odf), name
    for c in rdf.columns:
        assert rdf[c].equals(odf[c]), (name, c)


def test_planted_really_has_duplicates(planted_ddb):
    multi = planted_ddb.sql(
        "SELECT count(*) FROM (SELECT text FROM documents GROUP BY text "
        "HAVING count(*) > 1)").fetchone()[0]
    assert multi >= 5
    cross = planted_ddb.sql("""
        WITH p AS (SELECT max(doc_id) // 2 AS pv FROM documents)
        SELECT count(*) FROM documents d, p
        WHERE doc_id > pv AND EXISTS (
            SELECT 1 FROM documents o WHERE o.doc_id <= pv
            AND o.text = d.text)""").fetchone()[0]
    assert cross >= 3  # the Bloom-positive confirmed-dup branch fires


def test_keep_best_policy_diverges_from_min_id(ray_session, planted_dir):
    """The planted src0/src5 cluster proves the policy is really
    argmin-by-(source, id), not min-id."""
    from archbloom_ray import queries as q

    best = q.queries()["dedup_keep_best"](planted_dir).to_pandas()
    kept = set(best["doc_id"])
    assert 45 in kept and 3 not in kept


def test_nfc_distinct_composes_combining_chars(ray_session, tmp_path):
    """Planted unicode: composed vs decomposed 'café' count as ONE
    distinct NFC text; the same SQL oracle agrees on the same file."""
    import pyarrow.parquet as _pq

    from archbloom_ray import queries as q

    composed = "caf\u00e9"            # \u00e9 as one codepoint
    decomposed = "cafe\u0301"         # e + COMBINING ACUTE ACCENT
    assert composed != decomposed     # different byte sequences...
    texts = [composed, decomposed, composed, "plain ascii",
             "plain ascii", "other"]  # ...but ONE text after NFC
    tab = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["fr", "fr", "fr", "en", "en", "en"]),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    d = str(tmp_path / "uni")
    import os as _os
    _os.makedirs(d)
    _pq.write_table(tab, _os.path.join(d, "documents.parquet"))

    got = _norm(q.queries()["nfc_distinct"](d).to_pandas())
    assert got.loc[got.lang == "fr", "distinct_nfc"].item() == 1
    assert got.loc[got.lang == "en", "distinct_nfc"].item() == 2
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    ora = _norm(con.sql(q.oracle_sql()["nfc_distinct"]).df())
    for c in got.columns:
        assert got[c].equals(ora[c]), c


def test_semantic_dedup_prunes_planted_near_dups(ray_session):
    """SemDeDup recall gate: planted near-identical vectors (copy +
    1e-4 noise) are dropped in favor of their lowest-id original;
    well-separated vectors all survive."""
    import ray.data as rd

    from archbloom_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": v.astype(np.float32).tolist()})
    # ids 100+: near-copies of the first 10 vectors
    for j in range(10):
        noisy = base[j] + rng.normal(scale=1e-4, size=16)
        rows.append({"vec_id": 100 + j,
                     "embedding": noisy.astype(np.float32).tolist()})
    out = semantic_dedup(rd.from_items(rows), "vec_id", "embedding",
                         k=4, threshold=0.95).take_all()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 50
    # every planted copy dropped, every original kept
    for j in range(10):
        assert not by_id[100 + j]["kept"], j
        assert by_id[j]["kept"], j
    # random unit vectors in 16-d are far below 0.95 cosine
    assert all(by_id[i]["kept"] for i in range(40))


def test_semantic_dedup_strip_cap_matches_unchunked(ray_session):
    """The strip-evaluated Gram (max_cluster smaller than the cluster)
    must produce EXACTLY the same keep set as one big matrix."""
    import ray.data as rd

    from archbloom_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 8))
    dup = base[rng.integers(0, 30, 15)] + rng.normal(scale=1e-4, size=(15, 8))
    vecs = np.concatenate([base, dup])
    rows = [{"vec_id": i, "embedding": v.astype(np.float32).tolist()}
            for i, v in enumerate(vecs)]
    ref = {r["vec_id"]: r["kept"] for r in semantic_dedup(
        rd.from_items(rows), "vec_id", "embedding", k=1, iters=1,
        threshold=0.95, max_cluster=10_000).take_all()}
    chunked = {r["vec_id"]: r["kept"] for r in semantic_dedup(
        rd.from_items(rows), "vec_id", "embedding", k=1, iters=1,
        threshold=0.95, max_cluster=7).take_all()}
    assert ref == chunked
