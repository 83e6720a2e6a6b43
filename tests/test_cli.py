"""CLI smoke: about, batch resolve to parquet, seeded resolve."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv):
    return subprocess.run(
        [sys.executable, "-m", "zentity_spark.cli", *argv],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, ZENTITY_SPARK_MASTER="local[4]"))


def test_about():
    out = _run("about")
    assert out.returncode == 0
    meta = json.loads(out.stdout)
    assert meta["name"] == "zentity_spark"
    assert "version" in meta


def test_resolve_and_seeded(tmp_path, sf0001_dir):
    docs = os.path.join(sf0001_dir, "docs_spans.parquet")
    model = os.path.join(REPO, "fixtures", "model_person.json")

    out1 = _run("resolve", "--docs", docs, "--model", model,
                "--output", str(tmp_path / "clusters"),
                "--exclude-resolver", "r_name_city_weak")
    assert out1.returncode == 0, out1.stderr[-2000:]
    res1 = json.loads(out1.stdout.splitlines()[-1])
    assert res1["rows"] == 612     # = doc count of the sf0.001 fixture

    out2 = _run("seeded", "--docs", docs, "--model", model,
                "--output", str(tmp_path / "hits"),
                "--exclude-resolver", "r_name_city_weak",
                "--id", "a-000000", "--max-hops", "2")
    assert out2.returncode == 0, out2.stderr[-2000:]
    res2 = json.loads(out2.stdout.splitlines()[-1])
    assert res2["rows"] >= 1
