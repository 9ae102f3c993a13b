"""CLI parity tests (reference bin/bloomtool.c verbs) — run as real
subprocesses, the way a user would."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, check=True):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="2")
    r = subprocess.run(
        [sys.executable, "-m", "archbloom_ray.cli", *args],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if check and r.returncode not in (0, 1):
        raise AssertionError(f"cli failed ({r.returncode}): {r.stderr[-2000:]}")
    return r


@pytest.fixture(scope="module")
def keys_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    p = str(d / "keys.parquet")
    pq.write_table(pa.table({"url": [f"https://k{i}.example/x" for i in range(500)]}), p)
    return p


@pytest.mark.slow
def test_create_query_info_merge_flow(keys_parquet, tmp_path):
    sk = str(tmp_path / "a.sk")
    out = run_cli("create", keys_parquet, sk, "--column", "url",
                  "--kind", "bloom", "--expected", "2000", "--name", "mine")
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["saved"] == sk and info["hashcount"] >= 1

    # query present / absent — exit codes like bloomtool (0 present, 1 not)
    r = run_cli("query", sk, "https://k1.example/x")
    assert r.returncode == 0 and json.loads(r.stdout)["present"] is True
    r = run_cli("query", sk, "https://nope.example/x")
    assert r.returncode == 1 and json.loads(r.stdout)["present"] is False

    # info / rename
    info = json.loads(run_cli("info", sk).stdout.strip().splitlines()[-1])
    assert info["type"] == "BloomFilter"
    run_cli("rename", sk, "renamed")
    info = json.loads(run_cli("info", sk).stdout.strip().splitlines()[-1])
    assert info["name"] == "renamed"

    # merge with a second filter
    sk2 = str(tmp_path / "b.sk")
    keys2 = str(tmp_path / "k2.parquet")
    pq.write_table(pa.table({"url": ["https://other.example/1"]}), keys2)
    run_cli("create", keys2, sk2, "--column", "url", "--kind", "bloom",
            "--expected", "2000")
    merged = str(tmp_path / "m.sk")
    run_cli("merge", sk, sk2, merged)
    r = run_cli("query", merged, "https://other.example/1")
    assert r.returncode == 0
    r = run_cli("query", merged, "https://k1.example/x")
    assert r.returncode == 0


def test_transform_resumable(ray_session, tmp_path):
    import json
    import pyarrow.parquet as pq
    from archbloom_ray.cli import main
    from archbloom_ray.datagen import pages_fixture
    import glob, shutil, os

    src_dir = pages_fixture(3000, seed=7)
    # copy two shards into a fresh input dir (fixture dir may have one file)
    ind = tmp_path / "in"
    ind.mkdir()
    files = sorted(glob.glob(os.path.join(src_dir, "*.parquet")))
    shutil.copy(files[0], ind / "a.parquet")
    shutil.copy(files[0], ind / "b.parquet")
    out = str(tmp_path / "out")
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["transform", str(ind), out, "--ops", "quality,fingerprint,langid"])
    r = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert r["written"] == 2 and r["skipped"] == 0
    t = pq.read_table(os.path.join(out, "a"))
    assert {"quality_score", "fingerprint", "lang_pred"} <= set(t.column_names)
    assert t.num_rows == 3000
    # resume: nothing to do
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        main(["transform", str(ind), out])
    r2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert r2["skipped"] == 2 and r2["written"] == 0


def test_import_export_reference_format(tmp_path):
    """import-ref / export-ref migration shim round-trips the reference
    bloom_save layout byte-identically (golden bytes + geometry are
    covered in tests/test_bloom.py::TestReferenceFileFormat)."""
    from archbloom_ray.sketches.bloom import BloomFilter

    bf = BloomFilter(500, 0.01, name="cli")
    bf.update_arrow(pa.array([b"one", b"two", b"three"], type=pa.binary()))
    ref = str(tmp_path / "in.bf")
    with open(ref, "wb") as f:
        f.write(bf.to_reference_bytes())

    sk = str(tmp_path / "conv.sk")
    out = run_cli("import-ref", ref, sk)
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["name"] == "cli" and info["type"] == "BloomFilter"

    q = run_cli("query", sk, "two")
    assert q.returncode == 0

    back = str(tmp_path / "out.bf")
    run_cli("export-ref", sk, back)
    with open(back, "rb") as f:
        assert f.read() == bf.to_reference_bytes()


def test_index_build_and_search(ray_session, tmp_path):
    """index-build + index-search (AND and phrase) over a tiny corpus
    in-process (subprocess Ray spin-up is covered by the other CLI
    tests)."""
    import json as _json

    from archbloom_ray.cli import main

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["red fox runs", "red dog", "fox red", "dog log"]),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    idx = str(tmp_path / "idx")
    main(["index-build", src, idx, "--shards", "4"])
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["index-search", idx, "red", "fox", "--shards", "4"])
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out == {"n": 2, "ids": [1, 3]}

    pidx = str(tmp_path / "pidx")
    main(["index-build", src, pidx, "--shards", "4", "--ngram", "2"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["index-search", pidx, "red", "fox", "--phrase", "--shards", "4"])
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out == {"n": 1, "ids": [1]}


def test_create_new_sketch_kinds(keys_parquet, tmp_path):
    """blockedbloom / sparsehll / ddsketch reach the CLI factory."""
    bb = str(tmp_path / "bb.sk")
    run_cli("create", keys_parquet, bb, "--column", "url",
            "--kind", "blockedbloom", "--expected", "2000")
    r = run_cli("query", bb, "https://k1.example/x")
    assert r.returncode == 0 and json.loads(r.stdout)["present"] is True
    assert run_cli("query", bb, "https://nope.example/x").returncode == 1

    sp = str(tmp_path / "sp.sk")
    run_cli("create", keys_parquet, sp, "--column", "url",
            "--kind", "sparsehll", "--precision", "12")
    info = json.loads(run_cli("info", sp).stdout.strip().splitlines()[-1])
    assert info["type"] == "SparseHLL"

    nums = str(tmp_path / "nums.parquet")
    pq.write_table(pa.table({"v": list(range(1, 1001))}), nums)
    dd = str(tmp_path / "dd.sk")
    run_cli("create", nums, dd, "--column", "v",
            "--kind", "ddsketch", "--dd-alpha", "0.02")
    info = json.loads(run_cli("info", dd).stdout.strip().splitlines()[-1])
    assert info["type"] == "DDSketch"

    th = str(tmp_path / "th.sk")
    run_cli("create", keys_parquet, th, "--column", "url",
            "--kind", "theta", "--sketch-k", "512")
    info = json.loads(run_cli("info", th).stdout.strip().splitlines()[-1])
    assert info["type"] == "ThetaSketch" and info["k"] == 512

    sb = str(tmp_path / "sb.sk")
    # --expected seeds only the first stage, so 64 forces real growth;
    # 0.001 keeps the single absent probe below the compound FPR
    run_cli("create", keys_parquet, sb, "--column", "url",
            "--kind", "sbloom", "--expected", "64", "--accuracy", "0.001")
    r = run_cli("query", sb, "https://k1.example/x")
    assert r.returncode == 0 and json.loads(r.stdout)["present"] is True
    assert run_cli("query", sb, "https://nope.example/x").returncode == 1
    info = json.loads(run_cli("info", sb).stdout.strip().splitlines()[-1])
    assert info["type"] == "ScalableBloomFilter" and info["n_stages"] >= 3


def test_run_named_query(ray_session, tmp_path, capsys):
    from archbloom_ray.cli import main

    main(["run", "list"])
    names = capsys.readouterr().out.split()
    assert "lang_doc_counts" in names and "diversity_by_source" in names

    out = str(tmp_path / "res.parquet")
    main(["run", "diversity_by_source",
          "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == pq.read_table(out).num_rows > 0

    with pytest.raises(SystemExit):
        main(["run", "no_such_query"])


def test_run_stats_flag(ray_session, capsys):
    """--stats prints per-operator execution metrics to stderr when
    the pipeline returns a Dataset (the per-partition-metrics surface
    of the job-submission path)."""
    from archbloom_ray.cli import main

    main(["run", "lang_doc_counts",
          "--sf-dir", "/root/testdata/sf0.001", "--stats"])
    captured = capsys.readouterr()
    assert json.loads(captured.out.strip().splitlines()[-1])["rows"] > 0
    assert "Operator" in captured.err and "wall time" in captured.err


def test_profile_command(ray_session, capsys):
    from archbloom_ray.cli import main

    main(["profile", "/root/testdata/sf0.001/documents.parquet",
          "--numeric", "n_chars", "--string", "lang",
          "--topk", "2", "--quantile", "0.5"])
    prof = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["n_chars", "lang"])
    import numpy as np
    vals = np.asarray(t["n_chars"], dtype=np.float64)
    assert prof["count()"] == len(t)
    assert prof["min(n_chars)"] == vals.min()
    assert prof["max(n_chars)"] == vals.max()
    assert prof["sum(n_chars)"] == vals.sum()
    # --quantile 0.5 must REPLACE the default pair, not append to it
    assert "tdigest_q0.9(n_chars)" not in prof
    import collections
    exact = collections.Counter(t["lang"].to_pylist())
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(e["item"], e["count"]) for e in prof["top2(lang)"]] == want

    with pytest.raises(SystemExit):  # no columns given
        main(["profile", "/root/testdata/sf0.001/documents.parquet"])


def test_create_slidinghll_event_time(ray_session, tmp_path, capsys):
    import numpy as np

    from archbloom_ray.cli import main
    from archbloom_ray.sketches import SlidingHyperLogLog
    from archbloom_ray.sketches.base import sketch_from_bytes

    rng = np.random.default_rng(9)
    n = 2000
    t = pa.table({
        "k": pa.array([f"u{rng.integers(0, 80)}" for _ in range(n)]),
        "ts": pa.array((rng.integers(0, 5000, n) * 1_000_000 + 123)
                       .astype("datetime64[us]")),
    })
    src = str(tmp_path / "ev.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "ev.shll")
    main(["create", src, out, "--kind", "slidinghll", "--column", "k",
          "--secs-column", "ts", "--precision", "12"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["type"] == "SlidingHyperLogLog" and rep["n_entries"] > 0
    with open(out, "rb") as f:
        sk = sketch_from_bytes(f.read())
    assert isinstance(sk, SlidingHyperLogLog)
    # window estimate within bound of the brute-force distinct
    secs = (np.asarray(t["ts"].cast(pa.int64())) // 1_000_000)
    last = {}
    for k, s in zip(t["k"].to_pylist(), secs):
        last[k] = max(last.get(k, -1), int(s))
    for cut in (0, 2500, 4500):
        exact = sum(1 for s in last.values() if s >= cut)
        bound = max(3 * sk.relative_error_bound() * exact, 4.0)
        assert abs(sk.cardinality(since=cut) - exact) <= bound

    with pytest.raises(SystemExit):  # missing --secs-column
        main(["create", src, out, "--kind", "slidinghll", "--column", "k"])


def test_import_export_ref_cbloom_tdbloom(tmp_path):
    """--kind cbloom / tdbloom round-trip the reference counting and
    time-decaying formats byte-identically (golden bytes + geometry in
    tests/test_cbloom.py / test_tdbloom.py ReferenceFileFormat)."""
    from archbloom_ray.sketches.cbloom import CountingBloomFilter
    from archbloom_ray.sketches.tdbloom import TimeDecayingBloomFilter

    cbf = CountingBloomFilter(300, 0.01, width=4, name="clic")
    cbf.update_arrow(pa.array(["a", "a", "b"], type=pa.string()))
    ref = str(tmp_path / "in.cbf")
    with open(ref, "wb") as f:
        f.write(cbf.to_reference_bytes())
    sk = str(tmp_path / "conv.sk")
    info = json.loads(run_cli("import-ref", "--kind", "cbloom", ref, sk)
                      .stdout.strip().splitlines()[-1])
    assert info["name"] == "clic" and info["type"] == "CountingBloomFilter"
    back = str(tmp_path / "out.cbf")
    run_cli("export-ref", "--kind", "cbloom", sk, back)
    with open(back, "rb") as f:
        assert f.read() == cbf.to_reference_bytes()

    td = TimeDecayingBloomFilter(100, 0.01, timeout=60, start_time=500,
                                 name="clit")
    td.update_arrow(pa.array(["x", "y"]), now=500)
    ref2 = str(tmp_path / "in.tdb")
    with open(ref2, "wb") as f:
        f.write(td.to_reference_bytes())
    sk2 = str(tmp_path / "conv2.sk")
    info2 = json.loads(
        run_cli("import-ref", "--kind", "tdbloom", "--timeout", "60",
                ref2, sk2).stdout.strip().splitlines()[-1])
    assert info2["type"] == "TimeDecayingBloomFilter"
    back2 = str(tmp_path / "out.tdb")
    run_cli("export-ref", "--kind", "tdbloom", sk2, back2)
    with open(back2, "rb") as f:
        assert f.read() == td.to_reference_bytes()

    # kind mismatch is a clean error, not a crash
    r = run_cli("export-ref", "--kind", "bloom", sk2, back2, check=False)
    assert r.returncode == 2


def test_create_query_sharded(keys_parquet, tmp_path):
    """Sharded-directory surface: build each kind, probe locally
    (query-sharded is Ray-free), resume skips built shards."""
    for kind in ("bloom", "sbloom", "cuckoo"):
        d = str(tmp_path / f"sh-{kind}")
        out = run_cli("create-sharded", keys_parquet, d, "--kind", kind,
                      "--num-shards", "4", "--expected", "1000",
                      "--accuracy", "0.001")
        info = json.loads(out.stdout.strip().splitlines()[-1])
        assert info["saved"] == d and info["shards"] >= 1
        assert os.path.exists(os.path.join(d, "shardmap.json"))
        assert os.path.exists(os.path.join(d, "manifest.jsonl"))
        r = run_cli("query-sharded", d, "https://k1.example/x")
        assert r.returncode == 0 and json.loads(r.stdout)["present"] is True
        r = run_cli("query-sharded", d, "https://nope.example/zz")
        assert r.returncode == 1 and json.loads(r.stdout)["present"] is False
    # resume: a second bloom build touches nothing
    d = str(tmp_path / "sh-bloom")
    info = json.loads(run_cli(
        "create-sharded", keys_parquet, d, "--kind", "bloom",
        "--num-shards", "4", "--expected", "1000", "--accuracy", "0.001",
    ).stdout.strip().splitlines()[-1])
    assert info["built_shards"] == 0 and info["resumed_shards"] >= 1


def test_probe_sharded_directory(keys_parquet, tmp_path):
    """`probe` accepts a create-sharded directory: batch membership via
    the no-assembly sharded probes, written as parquet."""
    import pyarrow.dataset as pads

    d = str(tmp_path / "shp")
    run_cli("create-sharded", keys_parquet, d, "--kind", "sbloom",
            "--num-shards", "4", "--expected", "1000",
            "--accuracy", "0.001")
    out = str(tmp_path / "probed")
    run_cli("probe", d, keys_parquet, out, "--column", "url")
    t = pads.dataset(out).to_table()
    assert t.num_rows == 500 and all(t["present"].to_pylist())


def test_info_sharded_directory(keys_parquet, tmp_path):
    d = str(tmp_path / "shinfo")
    run_cli("create-sharded", keys_parquet, d, "--kind", "cuckoo",
            "--num-shards", "4", "--expected", "1000")
    info = json.loads(run_cli("info", d).stdout.strip().splitlines()[-1])
    assert info["type"] == "sharded" and info["kind"] == "cuckoo"
    assert info["shards_present"] >= 1
    assert info["manifest_rows"] >= info["shards_present"]
    assert info["total_state_bytes"] > 0


def test_merge_sharded_directories(keys_parquet, tmp_path):
    """merge-sharded folds an increment directory in: both key sets
    answer present afterwards (bloom: shard OR; sbloom: stage concat)."""
    inc_keys = str(tmp_path / "inc.parquet")
    pq.write_table(pa.table(
        {"url": [f"https://inc{i}.example/y" for i in range(200)]}),
        inc_keys)
    for kind in ("bloom", "sbloom", "cuckoo"):
        a = str(tmp_path / f"a-{kind}")
        b = str(tmp_path / f"b-{kind}")
        m = str(tmp_path / f"m-{kind}")
        run_cli("create-sharded", keys_parquet, a, "--kind", kind,
                "--num-shards", "4", "--expected", "1000",
                "--accuracy", "0.001")
        run_cli("create-sharded", inc_keys, b, "--kind", kind,
                "--num-shards", "4", "--expected", "1000",
                "--accuracy", "0.001")
        out = json.loads(run_cli("merge-sharded", a, b, m)
                         .stdout.strip().splitlines()[-1])
        assert out["kind"] == kind and out["shards"] >= 1
        assert run_cli("query-sharded", m,
                       "https://k1.example/x").returncode == 0
        assert run_cli("query-sharded", m,
                       "https://inc7.example/y").returncode == 0
        assert run_cli("query-sharded", m,
                       "https://nope.example/zz").returncode == 1


def test_create_query_sharded_tdbloom(tmp_path):
    """Event-time sharded tdbloom at the CLI: unit-coarsened clock fits
    the slot width's max_time; fresh keys present at end-of-ingest,
    stale keys (older than --timeout) absent, never-seen keys absent."""
    import numpy as np

    n = 1500
    rng = np.random.default_rng(11)
    secs = (1_700_000_000 + rng.integers(0, 100_000, n)).astype(np.int64)
    urls = [f"https://td{i}.example/x" for i in range(n)]
    src = str(tmp_path / "td.parquet")
    pq.write_table(pa.table({"url": urls, "secs": secs}), src)
    d = str(tmp_path / "shtd")
    out = run_cli("create-sharded", src, d, "--kind", "tdbloom",
                  "--column", "url", "--secs-column", "secs",
                  "--timeout", "20000", "--num-shards", "4",
                  "--expected", "3000")
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["kind"] == "tdbloom" and info["params"]["unit"] >= 1
    hi = int(secs.max())
    fresh = urls[int(np.argmax(secs))]
    stale = urls[int(np.argmin(secs))]          # ~100k s old >> 20k
    assert run_cli("query-sharded", d, fresh).returncode == 0
    assert run_cli("query-sharded", d, stale).returncode == 1
    assert run_cli("query-sharded", d,
                   "https://never.example/x").returncode == 1
    # explicit --at at end-of-ingest behaves identically
    assert run_cli("query-sharded", d, fresh,
                   "--at", str(hi)).returncode == 0


def test_probe_sharded_tdbloom_directory(tmp_path):
    """`probe` on a tdbloom directory: batch freshness at end-of-ingest
    (fresh keys all present, stale keys at the Bloom FPR only)."""
    import numpy as np
    import pyarrow.dataset as pads

    n = 1200
    rng = np.random.default_rng(23)
    secs = (1_700_000_000 + rng.integers(0, 80_000, n)).astype(np.int64)
    urls = [f"https://pb{i}.example/x" for i in range(n)]
    src = str(tmp_path / "td.parquet")
    pq.write_table(pa.table({"url": urls, "secs": secs}), src)
    d = str(tmp_path / "shtd")
    run_cli("create-sharded", src, d, "--kind", "tdbloom",
            "--column", "url", "--secs-column", "secs",
            "--timeout", "15000", "--num-shards", "4",
            "--expected", "2400")
    out = str(tmp_path / "probed")
    run_cli("probe", d, src, out, "--column", "url")
    t = pads.dataset(out).to_table()
    pres = dict(zip(t["url"].to_pylist(), t["present"].to_pylist()))
    hi = int(secs.max())
    fresh = [u for u, s in zip(urls, secs) if hi - s <= 10_000]
    stale = [u for u, s in zip(urls, secs) if hi - s > 20_000]
    assert all(pres[u] for u in fresh)
    assert np.mean([pres[u] for u in stale]) <= 0.05


def test_create_session8_kinds(ray_session, tmp_path):
    """req / dyndist / gss build through the generic create path and
    round-trip through info."""
    from archbloom_ray.cli import main

    for kind, col in [("req", "n_chars"), ("dyndist", "text"),
                      ("gss", "text")]:
        out = str(tmp_path / f"{kind}.sk")
        main(["create", "/root/testdata/sf0.001/documents.parquet", out,
              "--column", col, "--kind", kind])
        r = run_cli("info", out)
        info = json.loads(r.stdout.strip().splitlines()[-1])
        assert info["type"] in ("ReqSketch", "DynamicDistinct",
                                "GroupSizeSampler")


def test_create_static_kinds(tmp_path):
    """create-static builds xor / bfuse / xormap from parquet; query
    answers membership (filters) or the exact value (retrieval map);
    cqf query reports the count."""
    p = str(tmp_path / "kv.parquet")
    pq.write_table(pa.table({
        "url": [f"https://k{i}.example/x" for i in range(400)],
        "code": pa.array([i % 100 for i in range(400)], type=pa.int64()),
    }), p)
    for kind in ("xor", "bfuse"):
        sk = str(tmp_path / f"{kind}.sk")
        out = run_cli("create-static", p, sk, "--kind", kind,
                      "--column", "url")
        meta = json.loads(out.stdout.strip().splitlines()[-1])
        assert meta["n"] == 400
        q = run_cli("query", sk, "https://k7.example/x")
        assert json.loads(q.stdout.strip().splitlines()[-1])["present"]
    sk = str(tmp_path / "map.sk")
    out = run_cli("create-static", p, sk, "--kind", "xormap",
                  "--column", "url", "--value-column", "code")
    assert json.loads(out.stdout.strip().splitlines()[-1])["type"] == "XorMap"
    q = run_cli("query", sk, "https://k123.example/x")
    assert json.loads(q.stdout.strip().splitlines()[-1])["value"] == 23


def test_query_counting_qf_reports_count(tmp_path):
    from archbloom_ray.sketches import CountingQuotientFilter

    sk = CountingQuotientFilter(100, fpr=2.0 ** -40)
    sk.update_arrow(pa.array(["a", "a", "a", "b"]))
    path = str(tmp_path / "c.sk")
    with open(path, "wb") as f:
        f.write(sk.to_bytes())
    q = run_cli("query", path, "a")
    r = json.loads(q.stdout.strip().splitlines()[-1])
    assert r["present"] and r["count"] == 3


def test_create_query_merge_sharded_qf(tmp_path):
    """Sharded quotient-filter directory flow: fingerprint-range
    build, Ray-free single-key probe (counting variant reports the
    count), generic per-shard merge folds increments."""
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"text": ["alpha", "alpha", "beta", "alpha"]}),
                   p1)
    pq.write_table(pa.table({"text": ["beta", "gamma"]}), p2)
    d1, d2, dm = (str(tmp_path / n) for n in ("d1", "d2", "dm"))
    run_cli("create-sharded", p1, d1, "--kind", "cqf", "--column", "text",
            "--expected", "100", "--accuracy", "1e-12", "--num-shards", "3")
    q = run_cli("query-sharded", d1, "alpha")
    r = json.loads(q.stdout.strip().splitlines()[-1])
    assert r["present"] and r["count"] == 3
    assert run_cli("query-sharded", d1, "absent").returncode == 1
    run_cli("create-sharded", p2, d2, "--kind", "cqf", "--column", "text",
            "--expected", "100", "--accuracy", "1e-12", "--num-shards", "3")
    run_cli("merge-sharded", d1, d2, dm)
    r = json.loads(run_cli("query-sharded", dm, "beta")
                   .stdout.strip().splitlines()[-1])
    assert r["present"] and r["count"] == 2
    # plain qf: membership only
    dq = str(tmp_path / "dq")
    run_cli("create-sharded", p1, dq, "--kind", "qf", "--column", "text",
            "--expected", "100", "--accuracy", "0.001", "--num-shards", "3")
    r = json.loads(run_cli("query-sharded", dq, "beta")
                   .stdout.strip().splitlines()[-1])
    assert r["present"] and "count" not in r
    # bulk probe of the MERGED counting directory: exact summed counts
    outp = str(tmp_path / "probe_out")
    run_cli("probe", dm, p1, outp, "--column", "text")
    t = pq.read_table(outp)
    got = dict(zip(t["text"].to_pylist(), t["count"].to_pylist()))
    assert got == {"alpha": 3, "beta": 2}


def test_create_query_merge_sharded_cbloom(tmp_path):
    """Sharded counting-Bloom directory flow (VERDICT r4 item 3):
    position-sliced counter build, Ray-free single-key count probe,
    merge-sharded saturating-adds counter slices, bulk probe writes
    exact counts."""
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"text": ["alpha", "alpha", "beta", "alpha"]}),
                   p1)
    pq.write_table(pa.table({"text": ["beta", "gamma"]}), p2)
    d1, d2, dm = (str(tmp_path / n) for n in ("d1", "d2", "dm"))
    run_cli("create-sharded", p1, d1, "--kind", "cbloom", "--column",
            "text", "--expected", "1000", "--accuracy", "1e-9",
            "--counter-width", "16", "--num-shards", "4")
    q = run_cli("query-sharded", d1, "alpha")
    r = json.loads(q.stdout.strip().splitlines()[-1])
    assert r["present"] and r["count"] == 3
    q = run_cli("query-sharded", d1, "absent")
    assert q.returncode == 1
    assert json.loads(q.stdout.strip().splitlines()[-1])["count"] == 0
    run_cli("create-sharded", p2, d2, "--kind", "cbloom", "--column",
            "text", "--expected", "1000", "--accuracy", "1e-9",
            "--counter-width", "16", "--num-shards", "4")
    run_cli("merge-sharded", d1, d2, dm)
    r = json.loads(run_cli("query-sharded", dm, "beta")
                   .stdout.strip().splitlines()[-1])
    assert r["present"] and r["count"] == 2
    # bulk probe of the MERGED directory: counts summed across dirs
    outp = str(tmp_path / "probe_out")
    run_cli("probe", dm, p1, outp, "--column", "text")
    t = pq.read_table(outp)
    got = dict(zip(t["text"].to_pylist(), t["count"].to_pylist()))
    assert got == {"alpha": 3, "beta": 2}


def test_create_query_sharded_tdcbloom(tmp_path):
    """Event-time sharded tdcbloom at the CLI: counter-sum + timer-max
    decomposition behind the same unit-coarsened clock as tdbloom;
    fresh keys answer their multiplicity, stale keys count 0."""
    import numpy as np

    n = 1000
    rng = np.random.default_rng(31)
    secs = (1_700_000_000 + rng.integers(0, 100_000, n)).astype(np.int64)
    urls = [f"https://tdc{i}.example/x" for i in range(n)]
    # duplicate the freshest url (same timestamp) → count 2
    fresh_i = int(np.argmax(secs))
    urls2 = urls + [urls[fresh_i]]
    secs2 = np.append(secs, secs[fresh_i])
    src = str(tmp_path / "tdc.parquet")
    pq.write_table(pa.table({"url": urls2, "secs": secs2}), src)
    d = str(tmp_path / "shtdc")
    out = run_cli("create-sharded", src, d, "--kind", "tdcbloom",
                  "--column", "url", "--secs-column", "secs",
                  "--timeout", "20000", "--num-shards", "4",
                  "--expected", "4000", "--accuracy", "1e-9")
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["kind"] == "tdcbloom"
    assert info["params"]["timer_width"] in (8, 16, 32, 64)
    fresh = urls[fresh_i]
    stale = urls[int(np.argmin(secs))]          # ~100k s old >> 20k
    r = json.loads(run_cli("query-sharded", d, fresh)
                   .stdout.strip().splitlines()[-1])
    assert r["present"] and r["count"] == 2
    q = run_cli("query-sharded", d, stale)
    assert q.returncode == 1
    assert json.loads(q.stdout.strip().splitlines()[-1])["count"] == 0
    assert run_cli("query-sharded", d,
                   "https://never.example/x").returncode == 1
    # bulk probe: count column with the staleness rule applied
    outp = str(tmp_path / "probe_tdc")
    run_cli("probe", d, src, outp, "--column", "url")
    t = pq.read_table(outp)
    cnt = dict(zip(t["url"].to_pylist(), t["count"].to_pylist()))
    assert cnt[fresh] == 2 and cnt[stale] == 0
    # merge-sharded refuses td directories (per-directory clocks)
    d2 = str(tmp_path / "shtdc2")
    run_cli("create-sharded", src, d2, "--kind", "tdcbloom",
            "--column", "url", "--secs-column", "secs",
            "--timeout", "20000", "--num-shards", "4",
            "--expected", "4000", "--accuracy", "1e-9")
    m = run_cli("merge-sharded", d, d2, str(tmp_path / "mm"), check=False)
    assert m.returncode == 2
    assert "tdcbloom" in json.loads(m.stdout.strip().splitlines()[-1])["error"]


def test_merge_sharded_qf_capacity_guard(tmp_path):
    """Per-shard merges only see their own range — merge-sharded must
    re-check the GLOBAL 2^q capacity and fail closed."""
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"text": [f"a{i}" for i in range(50)]}), p1)
    pq.write_table(pa.table({"text": [f"b{i}" for i in range(50)]}), p2)
    d1, d2, dm = (str(tmp_path / n) for n in ("d1", "d2", "dm"))
    for src, d in ((p1, d1), (p2, d2)):
        run_cli("create-sharded", src, d, "--kind", "qf", "--column",
                "text", "--expected", "55", "--accuracy", "0.01",
                "--num-shards", "2")
    r = run_cli("merge-sharded", d1, d2, dm, check=False)
    assert r.returncode == 2
    assert "overflows capacity" in r.stdout
