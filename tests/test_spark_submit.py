"""The north rule's shipping contract, run for real: package the engine as
a zip, launch `spark-submit --py-files <zip> submit_entry.py` in a clean
working directory (no repo on sys.path), build an index and query it —
the packaged artifact must be self-contained."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = str(tmp_path / "dist" / "se.zip")
    subprocess.run(
        [sys.executable, "-m", "searchengine_spark.cli", "package", "--out", zip_path],
        cwd=REPO, check=True, capture_output=True,
    )
    assert os.path.getsize(zip_path) > 10_000
    shutil.copy(os.path.join(REPO, "submit_entry.py"), tmp_path)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def submit(*args: str) -> dict:
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]", "--py-files", "dist/se.zip",
             "submit_entry.py", *args],
            cwd=tmp_path, env=env, check=True, capture_output=True, text=True,
            timeout=240,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    built = submit(
        "build", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--index", "./idx", "--id-col", "doc_id", "--text-col", "text",
        "--range-bits", "2", "--buckets", "4",
    )
    assert built["n_docs"] == 500

    hits = submit("search", "--index", "./idx", "--query", "spark join stream",
                  "-k", "3")
    assert len(hits["hits"]) == 3
    assert hits["hits"][0]["doc_id"] == 477  # pinned: same result as in-process
