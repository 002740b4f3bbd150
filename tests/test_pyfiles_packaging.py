"""spark-submit --py-files packaging proof (north-rule deployment shape):
the package must work imported from a ZIP on PYTHONPATH — no __file__-
relative data loading, no filesystem assumptions — including inside
Python UDF workers (mapInPandas), which import the package independently
of the driver."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys
assert any(p.endswith("ccs.zip") for p in sys.path), sys.path
import clever_canal_spark
# the package must come from the zip, not a directory
assert "ccs.zip" in clever_canal_spark.__file__, clever_canal_spark.__file__

from pyspark.sql import functions as F
from clever_canal_spark.session import build_session
from clever_canal_spark.gen import FeedConfig, generate_feed
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig, apply_epoch
from clever_canal_spark.operators.multimodal import extract_media_meta

spark = build_session(master="local[2]", shuffle_partitions=2)
feed = generate_feed(spark, FeedConfig(n_events=400, n_urls=40))
table = LakeTable.create(
    spark, sys.argv[1], PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
)
res = apply_epoch(spark, feed, 0, table, ApplyConfig(merge_mode="mor"))
assert res.applied, "apply_epoch failed from zip"
n = table.scan().count()
assert n > 0, "empty table"

# mapInPandas path: the WORKER process must import the package from the
# zip too (this is where a broken --py-files ship actually fails)
media = spark.createDataFrame(
    [(1, bytearray(b"RIFF0000WAVE"))], "doc_id bigint, payload binary"
)
meta = extract_media_meta(media).collect()
assert len(meta) == 1, meta
print("ZIP_E2E_OK", n)
spark.stop()
"""


def test_package_runs_from_pyfiles_zip(tmp_path):
    zpath = str(tmp_path / "ccs.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "clever_canal_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    script = tmp_path / "driver.py"
    script.write_text(_DRIVER)
    env = dict(os.environ)
    env["PYTHONPATH"] = zpath  # the zip ONLY — the repo dir must not leak in
    r = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "table")],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=420,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "ZIP_E2E_OK" in r.stdout
