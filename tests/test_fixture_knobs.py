"""Pin the scale-aware fixture knobs' DEFAULTS.

The sf1 sweep tunes LSH planes and IVF/k-means/PQ granularity via env
(CCS_MP_PLANES, CCS_IVF_MOD, CCS_KMEANS_MOD, CCS_PQ_MOD) so k stays
fixed as the corpus grows. The driver gate at sf0.01 runs with NO env
set — these constants are baked into both the Spark queries and their
DuckDB oracle strings at import, so a silent default drift would change
recorded results across rounds. Pin them.
"""
import subprocess
import sys


def test_fixture_knob_defaults():
    from clever_canal_spark import entry_queries as eq

    assert eq._MP_PLANES == 4
    assert eq._MP_RADIUS == 2
    assert eq._IVF_MOD == 32
    assert eq._IVF_PROBES == 4
    assert eq._KM_MOD == 16
    assert eq._PQ_M == 8
    assert eq._PQ_MOD == 25
    # the oracle strings bake the defaults in at import
    assert "% 16 = 0" in eq.ORACLES["emb_outlier_scores"]
    assert "% 32 = 0" in eq.ORACLES["emb_ivf_topk"]


def test_fixture_knobs_reach_oracles():
    """Env overrides must flow into BOTH query constants and oracle SQL
    (a fresh interpreter, since the constants bind at import)."""
    code = (
        "from clever_canal_spark import entry_queries as eq\n"
        "assert eq._MP_PLANES == 10 and eq._KM_MOD == 160\n"
        "assert '% 160 = 0' in eq.ORACLES['emb_outlier_scores']\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={"CCS_MP_PLANES": "10", "CCS_KMEANS_MOD": "160",
             "PYTHONPATH": ".", "PATH": "/usr/bin:/bin"},
        capture_output=True, text=True, cwd=".",
    )
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout
