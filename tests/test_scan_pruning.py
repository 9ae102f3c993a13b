"""Repo-wide static guard: every Ray `read_parquet` call must pass
``columns=`` so only needed columns leave storage (VERDICT r2 item 2 —
the pages fixture carries a raw-HTML binary column; one unpruned scan
drags every page's HTML through the object store).

AST-based, no Ray session needed.  DuckDB's SQL ``read_parquet(...)``
(a string inside oracle SQL) is naturally out of scope — this walks
Python call nodes only.
"""

import ast
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
SCAN_FILES = sorted(
    list((REPO / "archbloom_ray").rglob("*.py"))
    + [REPO / "bench.py", REPO / "__ray_entry__.py"]
)


def _read_parquet_calls(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Attribute) and f.attr == "read_parquet":
                yield node


def test_every_read_parquet_is_column_pruned():
    offenders = []
    for path in SCAN_FILES:
        tree = ast.parse(path.read_text(), filename=str(path))
        for call in _read_parquet_calls(tree):
            kw = {k.arg for k in call.keywords}
            if "columns" not in kw:
                offenders.append(f"{path.relative_to(REPO)}:{call.lineno}")
    assert not offenders, (
        "read_parquet without columns= (unpruned scan): "
        + ", ".join(offenders)
    )


# Group keys whose cardinality grows with the data (users, documents,
# keys, hashes …).  A `grouped_agg(..., [unbounded key])` whose result
# is pulled to the driver with take_all() is an O(keys) driver-side
# reduction — the r3 verdict's remaining scale flag.  Bounded keys
# (lang, source, hour, bucket, split, priority …) are naturally small.
UNBOUNDED_KEYS = {
    "user_id", "id", "doc_id", "content_hash", "text", "url", "h",
    "o_orderkey", "l_orderkey", "key", "word", "u", "u1", "u2",
}

# Reviewed sites where the unbounded-key group is bounded by an
# upstream filter/increment before take_all (file basename, lineno of
# the grouped_agg call must appear in a comment-reviewed list below).
ALLOWLIST = {
    # incremental dedup: old_texts already filtered to the increment's
    # candidate hashes — take_all is O(increment), not O(corpus)
    ("dedup.py", "content_hash"),
    # boilerplate vocab: filtered to lines with >= min_docs occurrences
    # (frequent-line count, broadcast side)
    ("cleaning.py", "h"),
}


def _literal_keys(node):
    """Key list of a grouped_agg call if it is a literal list of strs."""
    if len(node.args) >= 2 and isinstance(node.args[1], ast.List):
        elts = node.args[1].elts
        if all(isinstance(e, ast.Constant) and isinstance(e.value, str)
               for e in elts):
            return {e.value for e in elts}
    return None


def _is_grouped_agg(call):
    f = call.func
    return (isinstance(f, ast.Name) and f.id == "grouped_agg") or (
        isinstance(f, ast.Attribute) and f.attr == "grouped_agg")


def test_no_unbounded_grouped_take_all():
    """No `grouped_agg(..., [unbounded key])` result reaches the driver
    via take_all() — certification sides must reduce distributively
    (per-block partials) instead (VERDICT r3 item 1)."""
    offenders = []
    for path in SCAN_FILES:
        tree = ast.parse(path.read_text(), filename=str(path))
        for fn in [n for n in ast.walk(tree)
                   if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]:
            # direct chain: grouped_agg(...)[.select_columns/.sort/
            # .filter/.limit …].take_all().  A .map_batches in the
            # chain is a per-block REDUCER (the approved partial-sum
            # pattern) and exempts the site.
            _PRESERVING = {"select_columns", "sort", "filter", "limit",
                           "materialize", "repartition"}
            for node in ast.walk(fn):
                if not (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Attribute)
                        and node.func.attr == "take_all"):
                    continue
                base = node.func.value
                while (isinstance(base, ast.Call)
                       and isinstance(base.func, ast.Attribute)
                       and base.func.attr in _PRESERVING):
                    base = base.func.value
                if isinstance(base, ast.Call) and _is_grouped_agg(base):
                    keys = _literal_keys(base)
                    if keys is None:
                        continue
                    bad = {k for k in keys & UNBOUNDED_KEYS
                           if (path.name, k) not in ALLOWLIST}
                    if bad:
                        offenders.append(
                            f"{path.relative_to(REPO)}:"
                            f"{node.lineno} keys={sorted(bad)}")
            # variable-mediated:  var = grouped_agg(...); ...;
            # var.take_all()
            assigns: dict[str, set] = {}
            for node in ast.walk(fn):
                if isinstance(node, ast.Assign) and \
                        isinstance(node.value, ast.Call) and \
                        _is_grouped_agg(node.value):
                    keys = _literal_keys(node.value)
                    if keys is None:
                        continue
                    bad = {k for k in keys & UNBOUNDED_KEYS
                           if (path.name, k) not in ALLOWLIST}
                    if bad:
                        for t in node.targets:
                            if isinstance(t, ast.Name):
                                assigns[t.id] = bad
            if assigns:
                for node in ast.walk(fn):
                    if isinstance(node, ast.Call) and \
                            isinstance(node.func, ast.Attribute) and \
                            node.func.attr == "take_all" and \
                            isinstance(node.func.value, ast.Name) and \
                            node.func.value.id in assigns:
                        offenders.append(
                            f"{path.relative_to(REPO)}:{node.lineno} "
                            f"var={node.func.value.id} "
                            f"keys={sorted(assigns[node.func.value.id])}")
    assert not offenders, (
        "grouped_agg over an unbounded key pulled to the driver with "
        "take_all() — reduce distributively (per-block partials) or "
        "add a reviewed ALLOWLIST entry: " + "; ".join(offenders))


# Candidate-pair Datasets are bounded by band collisions, not by the
# corpus — but a pathological near-dup corpus makes them huge, so the
# PAIR LIST must never be pulled to the driver as an intermediate
# (VERDICT r4 item 1: verify_pairs_equal's pair_rows take_all).  Flag
# any take_all() whose receiver chain includes select_columns(["id_a",
# "id_b"]) or a variable bound from a pair-producing stage call.
PAIR_PRODUCERS = {
    "minhash_lsh_pairs", "simhash_pairs", "embedding_near_dup_pairs",
    "minhash_similarity_join", "ngram_jaccard_exact_pairs",
    "edit_distance_pairs", "hamming_fingerprint_pairs",
    "verify_pairs_ngram",
}

# Reviewed final-result gathers (the bounded-output exemption): the
# take_all is the query RESULT (verified / threshold-filtered pairs),
# not an intermediate feeding further driver-side processing.
PAIR_TAKE_ALLOWLIST = {
    # queries.py _pairs_table: sorted-table gather of a VERIFIED /
    # high-threshold pair result (planted-duplicate bounded)
    ("queries.py", "_pairs_table"),
    # vocab-pair RESULT gather (lev ≤ 2 pairs over the token
    # vocabulary — vocabulary-bounded, and the query's final output)
    ("queries.py", "q_vocab_fuzzy_pairs"),
}


def _is_pair_select(call) -> bool:
    f = call.func
    if not (isinstance(f, ast.Attribute) and f.attr == "select_columns"):
        return False
    if call.args and isinstance(call.args[0], ast.List):
        vals = {e.value for e in call.args[0].elts
                if isinstance(e, ast.Constant)}
        return {"id_a", "id_b"} <= vals
    return False


def test_no_pair_list_take_all():
    """No candidate-pair list reaches the driver via take_all() as an
    intermediate — verifiers must use the partitioned pair-sides join
    (stages/dedup.py verify_pairs_*), results may gather only via the
    reviewed allowlist."""
    offenders = []
    for path in SCAN_FILES:
        tree = ast.parse(path.read_text(), filename=str(path))
        for fn in [n for n in ast.walk(tree)
                   if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]:
            if (path.name, fn.name) in PAIR_TAKE_ALLOWLIST:
                continue
            # variables bound from pair-producing calls or pair selects
            pair_vars = set()
            for node in ast.walk(fn):
                if isinstance(node, ast.Assign) and isinstance(node.value, ast.Call):
                    v = node.value
                    f = v.func
                    name = f.id if isinstance(f, ast.Name) else (
                        f.attr if isinstance(f, ast.Attribute) else None)
                    if name in PAIR_PRODUCERS or _is_pair_select(v):
                        for t in node.targets:
                            if isinstance(t, ast.Name):
                                pair_vars.add(t.id)
            for node in ast.walk(fn):
                if not (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Attribute)
                        and node.func.attr == "take_all"):
                    continue
                base = node.func.value
                chain_hit = False
                while isinstance(base, ast.Call) and isinstance(base.func, ast.Attribute):
                    if _is_pair_select(base):
                        chain_hit = True
                    base = base.func.value
                if chain_hit or (isinstance(base, ast.Name)
                                 and base.id in pair_vars):
                    offenders.append(
                        f"{path.relative_to(REPO)}:{node.lineno} in {fn.name}")
    assert not offenders, (
        "candidate-pair list pulled to the driver with take_all() — "
        "use the partitioned pair-sides join (verify_pairs_*) or add a "
        "reviewed PAIR_TAKE_ALLOWLIST entry: " + "; ".join(offenders))


def test_no_row_level_dataset_ops():
    """Lock the anti-pattern absences the r3 verdict verified: no
    per-row Dataset.map / iter_rows in the package (row loops belong
    inside vectorized map_batches), and Dataset.to_pandas only in the
    CLI display path (datagen's ThreadPoolExecutor.map is not a
    Dataset op and is allowlisted)."""
    ALLOW_MAP = {"datagen.py"}  # executor.map over writer chunks
    offenders = []
    for path in SCAN_FILES:
        if path.name in ("bench.py",):
            continue
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)):
                continue
            attr = node.func.attr
            if attr == "iter_rows":
                offenders.append(
                    f"{path.relative_to(REPO)}:{node.lineno} iter_rows")
            elif attr == "map" and path.name not in ALLOW_MAP:
                offenders.append(
                    f"{path.relative_to(REPO)}:{node.lineno} .map(")
            elif attr == "to_pandas" and path.name not in (
                    "cli.py", "__ray_entry__.py"):  # tiny display/contract tables
                offenders.append(
                    f"{path.relative_to(REPO)}:{node.lineno} to_pandas")
    assert not offenders, (
        "row-level Dataset ops in the package (vectorize via "
        "map_batches, or extend the reviewed allowlist): "
        + "; ".join(offenders))


def test_parquet_column_bounds_matches_scan(tmp_path):
    """Footer-statistics bounds == scan bounds; stats-less files return
    None (the scan fallback signal)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from archbloom_ray.sources import parquet_column_bounds

    rng = np.random.default_rng(3)
    ts = rng.integers(1_700_000_000, 1_800_000_000, 5000)
    t = pa.table({"ts": pa.array(ts, pa.int64()),
                  "x": pa.array(rng.random(5000))})
    d = tmp_path / "dir"
    d.mkdir()
    pq.write_table(t.slice(0, 2500), d / "a.parquet", row_group_size=512)
    pq.write_table(t.slice(2500), d / "b.parquet", row_group_size=512)
    assert parquet_column_bounds(str(d), "ts") == (ts.min(), ts.max())
    assert parquet_column_bounds(str(d / "a.parquet"), "ts") == \
        (ts[:2500].min(), ts[:2500].max())
    assert parquet_column_bounds(str(d), "missing") is None

    nostats = tmp_path / "nostats.parquet"
    pq.write_table(t, nostats, write_statistics=False)
    assert parquet_column_bounds(str(nostats), "ts") is None


def test_parquet_ts_max_us_footer_and_scan_fallback(tmp_path, ray_session):
    """The shared end-of-ingest helper: footer stats when present, ONE
    pruned scan when absent — callers never see None (review finding:
    the bare bounds[1] idiom crashed on stats-less files)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from archbloom_ray.sources import parquet_ts_max_us

    rng = np.random.default_rng(4)
    us = rng.integers(1_700_000_000, 1_800_000_000, 2000) * 1_000_000
    t = pa.table({"ts": pa.array(us, pa.int64()).cast(pa.timestamp("us"))})
    with_stats = tmp_path / "s.parquet"
    pq.write_table(t, with_stats)
    assert parquet_ts_max_us(str(with_stats), "ts") == int(us.max())
    nostats = tmp_path / "n.parquet"
    pq.write_table(t, nostats, write_statistics=False)
    assert parquet_ts_max_us(str(nostats), "ts") == int(us.max())
