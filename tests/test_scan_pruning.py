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
