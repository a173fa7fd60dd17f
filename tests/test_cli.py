"""CLI smoke: the ray-job driver surface (build → query → bench-queries)."""

import json
import shutil
import subprocess
import sys

import pytest


@pytest.mark.parametrize("dummy", [0])
def test_cli_build_and_query(tmp_path, dummy):
    # materialize a tiny corpus parquet
    corpus = tmp_path / "corpus.parquet"
    idx = tmp_path / "idx"
    code = (
        "import ray; ray.init(address='local', num_cpus=4, "
        "include_dashboard=False, logging_level='ERROR')\n"
        "from open_source_search_engine_ray.sources.transcripts import "
        "transcripts_table\n"
        "import pyarrow.parquet as pq\n"
        f"pq.write_table(transcripts_table(80), '{corpus}')\n"
        "ray.shutdown()\n")
    subprocess.run([sys.executable, "-c", code], check=True, cwd="/root/repo")

    r = subprocess.run(
        [sys.executable, "-m", "open_source_search_engine_ray", "build",
         "--input", str(corpus), "--out", str(idx), "--partitions", "8"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["n_docs"] == 80

    r = subprocess.run(
        [sys.executable, "-m", "open_source_search_engine_ray", "query",
         "--index", str(idx), "--q", "w0002", "-k", "3"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "hits in" in r.stdout

    shutil.rmtree(idx, ignore_errors=True)
