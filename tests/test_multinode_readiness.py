"""Multi-node readiness (VERDICT r4 item 7): the engine targets a real
cluster but has only run single-node — lock the audited assumptions
(README.md §Multi-node readiness inventory).

The strongest single-box proxy: drive real queries from a FOREIGN
working directory in a fresh subprocess whose Ray session mimics a job
runner (nothing may resolve relative to the repo cwd), and pin the
degraded modes of the local-FS helpers.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import json, os, sys
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         runtime_env={"env_vars": {"PYTHONPATH": os.environ["PYTHONPATH"],
                                   "GRAFT_FIXTURE_DIR":
                                   os.environ["GRAFT_FIXTURE_DIR"]}})
import importlib.util

spec = importlib.util.spec_from_file_location(
    "__ray_entry__", os.path.join(os.environ["REPO"], "__ray_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
qs = mod.queries()
sf = "/root/testdata/sf0.001"
out = {}
# one plain aggregate, one broadcast-sharded-state pipeline, one
# pages-family query (exercises the GRAFT_FIXTURE_DIR redirect)
for name in ("lang_doc_counts", "sharded_bloom_membership",
             "pages_url_membership"):
    res = qs[name](sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    out[name] = len(df)
ray.shutdown()
print(json.dumps(out))
"""


def test_queries_run_from_foreign_cwd(tmp_path):
    """Three representative queries driven from an unrelated cwd with
    the fixture cache redirected — any hidden repo-relative or
    default-/tmp dependence in a query path fails here."""
    fixture_dir = str(tmp_path / "shared_fixtures")
    env = dict(os.environ, PYTHONPATH=REPO, REPO=REPO,
               GRAFT_FIXTURE_DIR=fixture_dir)
    r = subprocess.run([sys.executable, "-c", _DRIVER],
                       capture_output=True, text=True, env=env,
                       cwd=str(tmp_path), timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert counts["lang_doc_counts"] >= 1
    assert counts["sharded_bloom_membership"] >= 1
    assert counts["pages_url_membership"] >= 1
    # the pages fixture landed in the redirected (shared-mount) cache
    assert os.path.isdir(fixture_dir) and os.listdir(fixture_dir)


def test_parquet_column_bounds_remote_scheme_degrades_to_none():
    """Remote URIs aren't glob-able: the footer helper must return
    None (= callers run the Ray-side pruned-scan fallback, which DOES
    handle remote schemes) rather than raising or fabricating."""
    from archbloom_ray.sources import parquet_column_bounds

    assert parquet_column_bounds("s3://bucket/corpus", "ts") is None
    assert parquet_column_bounds("gs://bucket/x.parquet", "ts") is None
