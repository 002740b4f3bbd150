"""End-to-end smoke of scripts/run_curation.py --demo: every stage prints
a non-trivial count and the packed output parquet carries the curated
invariants (PII placeholders present, exactly one dup survivor)."""

import glob
import os
import re
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_curation_demo_end_to_end():
    env = {**os.environ, "PYTHONPATH": REPO, "CCS_DEMO_EVENTS": "900"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"), "--demo"],
        env=env, capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    out = r.stdout.replace("\r", "\n")
    assert r.returncode == 0, out[-2000:] + r.stderr[-2000:]
    for stage in ("[curate] lake scan", "[curate] gopher quality",
                  "[curate] pii scrub", "[curate] boilerplate strip",
                  "[curate] in-corpus exact dedup", "[curate] mix",
                  "[curate] wrote"):
        assert stage in out, (stage, out[-1500:])
    # counts: short doc dropped by quality, one dup twin removed by dedup
    scan = int(re.search(r"lake scan: (\d+)", out).group(1))
    qual = int(re.search(r"gopher quality: (\d+)", out).group(1))
    kept = int(re.search(r"exact dedup: (\d+)", out).group(1))
    assert qual < scan and kept == qual - 1
    assert re.search(r"pii scrub: 1 emails, 1 ips, 1 phones", out)
    out_dir = re.search(r"-> (\S+)$", out.strip().splitlines()[-1]).group(1)
    con = duckdb.connect()
    n_pii = con.execute(
        f"SELECT COUNT(*) FROM '{out_dir}/*.parquet' WHERE text LIKE '%<EMAIL>%'"
    ).fetchone()[0]
    n_dup = con.execute(
        f"SELECT COUNT(*) FROM '{out_dir}/*.parquet' "
        f"WHERE text LIKE 'the quick brown fox jumps over the lazy dog and then runs%'"
    ).fetchone()[0]
    assert n_pii == 1 and n_dup == 1


def test_curation_demo_with_model_quality_stage():
    """--model-quality-threshold-e6 wires the linear classifier in; with
    the minimum threshold nothing drops (stage provably ran, pipeline
    invariants unchanged)."""
    env = {**os.environ, "PYTHONPATH": REPO, "CCS_DEMO_EVENTS": "600"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--demo", "--model-quality-threshold-e6", "-1000001"],
        env=env, capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    out = r.stdout.replace("\r", "\n")
    assert r.returncode == 0, out[-2000:] + r.stderr[-2000:]
    m = re.search(r"model quality \(avg_e6 >= -1000001\): (\d+) docs pass", out)
    assert m, out[-1500:]
    qual = int(re.search(r"gopher quality: (\d+)", out).group(1))
    assert int(m.group(1)) == qual  # floor threshold: nobody drops


def test_curation_demo_with_ppl_and_dsir_stages():
    """--ppl-drop-bucket tail + --dsir-keep-pct 60 wire the CCNet
    perplexity tercile drop and the DSIR importance keep into the
    pipeline; both stage lines must print with counts consistent with
    their contracts (tail drop removes >=1 doc on a 3-bucket split;
    DSIR keeps >= 60% of its input but not everything)."""
    env = {**os.environ, "PYTHONPATH": REPO, "CCS_DEMO_EVENTS": "600"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--demo", "--ppl-drop-bucket", "tail", "--dsir-keep-pct", "60"],
        env=env, capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    out = r.stdout.replace("\r", "\n")
    assert r.returncode == 0, out[-2000:] + r.stderr[-2000:]
    qual = int(re.search(r"gopher quality: (\d+)", out).group(1))
    m = re.search(r"ccnet perplexity \(drop tail\): (\d+) docs keep", out)
    assert m, out[-1500:]
    ppl = int(m.group(1))
    assert 0 < ppl < qual  # the tail tercile is non-empty and dropped
    m = re.search(r"dsir importance \(top 60%, bin >= (-?\d+)\): (\d+) docs keep", out)
    assert m, out[-1500:]
    dsir = int(m.group(2))
    # >= 60% of the scored docs keep (ties share a bin), but not all
    assert ppl * 60 <= dsir * 100 <= 100 * ppl
    assert dsir < ppl
