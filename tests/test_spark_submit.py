"""End-to-end smoke of the north-rule deployment shape: package the
library with ``make_pyfiles_zip``, run ``scripts/submit_build.py``
through real ``spark-submit --py-files``, then open the produced index
from this process and verify queries + lineage metrics.

The submitted job imports ``searcharray_spark`` ONLY from the zip (the
repo dir is stripped from the child's PYTHONPATH), so this fails if the
package ever grows an import that doesn't survive --py-files shipping
(data files, native extensions, __file__-relative reads).
"""
import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None
    or not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="spark-submit or test data unavailable")


def test_spark_submit_pyfiles_build_and_query(tmp_path, spark):
    zip_path = str(tmp_path / "searcharray_spark.zip")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "make_pyfiles_zip.py"),
                    zip_path], check=True, cwd=REPO)

    idx_path = str(tmp_path / "submit_idx")
    env = dict(os.environ)
    # the child must resolve searcharray_spark from the zip, not the repo
    env.pop("PYTHONPATH", None)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    proc = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_build.py"),
         "--corpus", os.path.join(SF_DIR, "documents.parquet"),
         "--index", idx_path,
         "--text-col", "text", "--doc-id-col", "doc_id",
         "--order-col", "doc_id",
         "--checkpoint-groups", "2"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["num_docs"] > 0

    # per-group lineage markers + per-stage metrics were written
    markers = os.listdir(os.path.join(idx_path, "_groups"))
    assert sorted(markers) == ["group_0_of_2.done", "group_1_of_2.done"]
    with open(os.path.join(idx_path, "metrics.jsonl")) as fh:
        records = [json.loads(ln) for ln in fh]
    stages = [r["stage"] for r in records if "stage" in r]
    assert stages.count("build_group") == 2
    finalize = [r for r in records if r.get("stage") == "finalize"][-1]
    assert finalize["docs_per_sec"] > 0
    assert finalize["postings_bytes"] > 0

    # the index the cluster job wrote is queryable from a fresh session
    from searcharray_spark import SearchIndex
    idx = SearchIndex(spark, idx_path)
    assert idx.num_docs == summary["num_docs"]
    top = idx.top_k("the", k=5).collect()
    assert len(top) > 0
