"""spark-submit --py-files deployment contract (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

The sandbox has no real cluster, so the multi-executor part is evidenced by
the scaling campaign (BENCH/BASELINE.md); THIS test pins the deployment
artifact itself: ``scripts/build_zip.py`` produces a zip from which a fresh
``spark-submit`` process — run OUTSIDE the repo checkout, so the package can
only import from the archive — resolves the fixture corpus end-to-end and
reproduces the flagship result (pairwise F1 = 1.0 on the labeled pairs).

Mirrors the reference's packaged-deploy integration path (zentity ships as
an ES plugin zip installed into a vanilla node — SURVEY.md §6.3); here the
unit of deployment is the --py-files archive.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from build_zip import build  # noqa: E402


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_zip_is_deterministic_and_complete(tmp_path):
    z1 = tmp_path / "a.zip"
    z2 = tmp_path / "b.zip"
    members = build(str(z1))
    build(str(z2))
    assert z1.read_bytes() == z2.read_bytes(), "zip must be reproducible"
    # every package module is present, importable from archive root
    assert "zentity_spark/__init__.py" in [m.replace(os.sep, "/") for m in members]
    with zipfile.ZipFile(z1) as z:
        names = set(z.namelist())
    on_disk = set()
    for root, _dirs, files in os.walk(os.path.join(REPO, "zentity_spark")):
        for f in files:
            if f.endswith(".py"):
                on_disk.add(os.path.relpath(os.path.join(root, f), REPO))
    assert names == {p.replace(os.sep, "/") for p in on_disk}


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    """Fresh JVM + fresh Python, package imported ONLY from the zip."""
    zip_path = tmp_path / "zentity_spark.zip"
    build(str(zip_path))
    app = tmp_path / "submit_app.py"
    shutil.copy(os.path.join(REPO, "scripts", "submit_app.py"), app)
    out_dir = tmp_path / "out"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # repo must NOT be importable
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    cmd = [
        _spark_submit(), "--master", "local[4]",
        "--py-files", str(zip_path), str(app),
        "resolve",
        "--docs", os.path.join(REPO, "fixtures", "sf0.001", "docs_spans.parquet"),
        "--model", os.path.join(REPO, "fixtures", "model_person.json"),
        "--output", str(out_dir),
        "--shuffle-partitions", "8",
    ]
    proc = subprocess.run(cmd, cwd=tmp_path, env=env, timeout=420,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-4000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])

    con = duckdb.connect()
    docs_glob = os.path.join(REPO, "fixtures", "sf0.001", "docs_spans.parquet")
    pairs_glob = os.path.join(REPO, "fixtures", "sf0.001",
                              "labeled_pairs.parquet")
    out_glob = os.path.join(str(out_dir), "*.parquet")
    n_docs = con.sql(f"SELECT count(*) FROM '{docs_glob}'").fetchone()[0]
    assert report["rows"] == n_docs  # one assignment per input doc

    # flagship invariant, recomputed from the submitted job's output alone:
    # every labeled match pair co-clustered, every labeled non-match split
    tp, fp, fn = con.sql(f"""
        SELECT sum(CASE WHEN pred AND label=1 THEN 1 ELSE 0 END),
               sum(CASE WHEN pred AND label=0 THEN 1 ELSE 0 END),
               sum(CASE WHEN NOT pred AND label=1 THEN 1 ELSE 0 END)
        FROM (SELECT ca.entity_id = cb.entity_id AS pred, lp.label
              FROM '{pairs_glob}' lp
              JOIN '{out_glob}' ca ON ca.doc_id = lp.doc_id_a
              JOIN '{out_glob}' cb ON cb.doc_id = lp.doc_id_b)
    """).fetchone()
    assert (fp, fn) == (0, 0) and tp > 0, (tp, fp, fn)

    # span-sequence passthrough: output spans byte-identical to input spans
    mism = con.sql(f"""
        SELECT count(*) FROM '{docs_glob}' d JOIN '{out_glob}' o USING (doc_id)
        WHERE to_json(d.spans) IS DISTINCT FROM to_json(o.spans)
    """).fetchone()[0]
    assert mism == 0
