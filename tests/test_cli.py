"""The query front door (``python -m big_data_assignment2_spark.search``)
must answer the reference's three ``app/app.sh`` smoke queries over the
reference fixture corpus with exactly the in-process engine's results, in
the reference's ``rank\\tdoc_id\\ttitle\\tscore`` line format."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from big_data_assignment2_spark.sources.reference_corpus import (
    REFERENCE_DATA_DIR,
    SMOKE_QUERIES,
    reference_search,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DATA_DIR), reason="reference fixture not present"
)


def _run_cli(scratch: str, argv: list[str], stdin: str | None = None) -> list[str]:
    env = dict(os.environ, SPARK_GRAFT_SCRATCH=scratch, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_assignment2_spark.search", *argv],
        cwd=REPO,
        env=env,
        input=stdin,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return [l for l in proc.stdout.splitlines() if l.strip()]


def test_cli_answers_app_sh_smoke_queries(spark, tmp_path):
    scratch = str(tmp_path)  # index built by the first invocation, reused after
    queries = list(SMOKE_QUERIES.values())
    for i, q in enumerate(queries):
        # exercise both front doors: argv (search.sh "$*") and piped stdin
        lines = (
            _run_cli(scratch, q.split())
            if i % 2 == 0
            else _run_cli(scratch, [], stdin=q + "\n")
        )
        expected = [
            f"{r['rank']}\t{r['doc_id']}\t{r['title']}\t{r['score']}"
            for r in reference_search(spark, q).collect()
        ]
        assert lines == expected, f"query {q!r}"
        assert len(lines) == 10
        ranks = [int(l.split("\t")[0]) for l in lines]
        assert ranks == list(range(1, 11))


def test_cli_empty_query_errors(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_SCRATCH=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_assignment2_spark.search"],
        cwd=REPO,
        env=env,
        input="",
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 1
    assert "No query provided." in proc.stdout


def test_pyds_writer_two_phase_commit_discipline(spark, sf_dir):
    """The textdirio writer must publish atomically: after save(), the
    directory holds exactly the manifest's files, the manifest matches
    the corpus size, and no _staging dir survives (commit cleans up on
    success; abort would on failure)."""
    import os

    from big_data_assignment2_spark.sources.doc_export import ensure_pyds_written

    out = ensure_pyds_written(spark, sf_dir)
    names = os.listdir(out)
    assert "_MANIFEST" in names
    assert not any(n.startswith("_staging") for n in names)
    txt = sorted(n for n in names if n.endswith(".txt"))
    manifest = sorted(open(f"{out}/_MANIFEST").read().splitlines())
    assert txt == manifest and len(txt) > 0
