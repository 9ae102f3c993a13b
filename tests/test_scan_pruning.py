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
