"""The north rule's deployment contract: the job runs via
``spark-submit --py-files yadf_spark.zip`` (north_rule: "run via
spark-submit --py-files on a multi-executor cluster"). This test builds
the zip with scripts/build_pyfiles.sh and runs a small end-to-end
candidate job from a DIFFERENT working directory, so both the driver
and the executor Python workers must resolve ``yadf_spark`` from the
shipped archive, not from the repo checkout — the exact failure mode a
real cluster submission hits when the package isn't distributed."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
# imports resolve from the --py-files zip: the submit cwd has no checkout
from yadf_spark.config import LshConfig
from yadf_spark.fixtures.images import images_df
from yadf_spark.operators import minhash

df = images_df(spark, 2000, seed=7)
pairs = minhash.minhash_candidates(df, LshConfig(), id_col="image_id", text_col="caption")
print("PYFILES_PAIRS", pairs.count())
spark.stop()
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_roundtrip(tmp_path):
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "build_pyfiles.sh")],
        check=True,
        capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "yadf_spark.zip")
    assert os.path.exists(zip_path)
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = dict(os.environ)
    # strip any repo path the test runner exported — the zip must carry
    # the package on its own
    env["PYTHONPATH"] = ""
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.driver.memory=4g",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            str(driver),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    marker = [ln for ln in proc.stdout.splitlines() if ln.startswith("PYFILES_PAIRS")]
    assert marker, proc.stdout[-2000:]
    assert int(marker[0].split()[1]) > 0
