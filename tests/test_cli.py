"""CLI surface (spark-submit entry): package / build / search in-process."""

from __future__ import annotations

import json
import os
import zipfile

from searchengine_spark import cli


def test_package_zip(tmp_path, capsys):
    out = str(tmp_path / "dist" / "pkg.zip")
    cli.main(["package", "--out", out])
    assert os.path.exists(out)
    names = zipfile.ZipFile(out).namelist()
    assert "searchengine_spark/cli.py" in names
    assert "searchengine_spark/index/build.py" in names
    assert json.loads(capsys.readouterr().out)["packaged"] == out


def test_build_then_search(tmp_path, capsys, spark):
    idx = str(tmp_path / "idx")
    cli.main(
        [
            "build", "--synthetic", "150", "--index", idx,
            "--buckets", "4", "--range-bits", "2", "--fresh",
        ]
    )
    built = json.loads(capsys.readouterr().out)
    assert built["n_docs"] == 150 and built["docs_per_sec"] > 0

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "5"])
    res = json.loads(capsys.readouterr().out)
    assert res["hits"] and len(res["hits"]) <= 5
    scores = [h["score"] for h in res["hits"]]
    assert scores == sorted(scores, reverse=True)

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "5", "--mode", "and"])
    res_and = json.loads(capsys.readouterr().out)
    and_scores = [h["score"] for h in res_and["hits"]]
    assert and_scores == sorted(and_scores, reverse=True)
