"""Local replica of the driver's correctness gate: run every
``queries()`` entry and hash-compare against its ``oracle_sql()`` in
DuckDB (row count + schema + order-insensitive values), at the same
sf the driver uses (0.01)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = os.environ.get("GRAFT_CORRECTNESS_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def entry_module(ray_session):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(entry_module):
    out = entry_module.entry()
    df = _to_pandas(out)
    assert len(df) >= 1
    assert set(df.columns) == {"sketch_id", "estimate", "state_bytes"}


def _oracle_pairs(entry_module):
    qs = entry_module.queries()
    sql = entry_module.oracle_sql()
    assert set(sql) <= set(qs), "oracle_sql keys must be a subset of queries"
    return qs, sql


def test_all_oracle_queries_match(entry_module, ddb):
    qs, sqls = _oracle_pairs(entry_module)
    failures = []
    for name, sql in sqls.items():
        try:
            ray_df = _normalize(_to_pandas(qs[name](SF_DIR)))
            ora_df = _normalize(ddb.sql(sql).df())
            if list(ray_df.columns) != list(ora_df.columns):
                failures.append((name, f"schema {list(ray_df.columns)} != {list(ora_df.columns)}"))
                continue
            if len(ray_df) != len(ora_df):
                failures.append((name, f"rows {len(ray_df)} != {len(ora_df)}"))
                continue
            for c in ray_df.columns:
                a, b = ray_df[c], ora_df[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    same = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
                else:
                    same = a.equals(b)
                if not same:
                    diff = (a != b) if len(a) == len(b) else None
                    failures.append((name, f"column {c} values differ"))
                    break
        except Exception as e:  # surface which query exploded
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures


def test_registry_names_frozen_additions_only(entry_module):
    """The driver samples queries BY NAME across rounds — a rename
    silently shrinks cross-round comparability (VERDICT r4 item 8).
    Every name in the frozen snapshot must stay registered; new names
    append to the snapshot (regenerate it, never prune it)."""
    snap = os.path.join(os.path.dirname(__file__), "data",
                        "query_registry_names.txt")
    frozen = {ln.strip() for ln in open(snap) if ln.strip()}
    qs = entry_module.queries()
    missing = frozen - set(qs)
    assert not missing, (
        f"registered query names disappeared (rename/removal breaks "
        f"driver continuity): {sorted(missing)}")
    new = set(qs) - frozen
    assert not new, (
        f"new queries {sorted(new)} — append them to "
        f"tests/data/query_registry_names.txt (additions-only snapshot)")


def test_rows_only_queries_run(entry_module):
    qs, sqls = _oracle_pairs(entry_module)
    for name in set(qs) - set(sqls):
        df = _to_pandas(qs[name](SF_DIR))
        assert len(df) >= 1, name


def test_sketch_queries_within_bounds(entry_module, ddb):
    """The approximate queries, checked against exact oracles with the
    algorithms' published bounds (the part SQL can't express)."""
    qs = entry_module.queries()
    hll = _to_pandas(qs["hll_distinct_text"](SF_DIR))
    exact = ddb.sql("SELECT count(DISTINCT text) FROM documents").fetchone()[0]
    assert hll["distinct_text_exact"][0] == exact
    assert hll["hll_within_bound"].all()

    cms = _to_pandas(qs["cms_source_counts"](SF_DIR))
    exact_src = ddb.sql("SELECT source, count(*) c FROM documents GROUP BY source").df()
    merged = cms.merge(exact_src, on="source")
    assert (merged["exact_count"] == merged["c"]).all()
    assert merged["cms_within_bound"].all()

    qsk = _to_pandas(qs["quantile_sketches"](SF_DIR))
    chars = ddb.sql("SELECT n_chars FROM documents").df()["n_chars"].to_numpy(dtype=float)
    s = np.sort(chars)
    for _, row in qsk.iterrows():
        # exact side replicates quantile_cont (driver oracle hash-compares
        # it); here check it's rank-consistent and the verdicts hold
        left = np.searchsorted(s, row["exact"], side="left") / len(s)
        right = np.searchsorted(s, row["exact"], side="right") / len(s)
        assert left - 1 / len(s) <= row["q"] <= right + 1 / len(s)
        assert row["tdigest_within_bound"] and row["kll_within_bound"], row["q"]
