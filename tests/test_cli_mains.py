"""Subprocess smoke tests for the job ENTRYPOINTS (``main()``), not just
their bodies.

Why these exist (r4 advice): the --warc CLI path carried a NameError for a
full round because every test invoked ``land_warc``/``run_extract``
directly and nothing ever executed ``main()`` — argument wiring, source
dispatch, the final stats print, and ``spark.stop()`` were all dead code
to the suite.  Each test here runs the real CLI in a fresh interpreter
(own JVM — these are the slowest tests in the suite, by design) and
asserts on exit code, stdout contract, and on-disk output.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_extract_job_main_warc_path(tmp_path):
    """The --warc entry end to end: segment landing, extraction, resume
    commit, and the final stats print (the line the r4 NameError killed)."""
    from ocr_table_extractor_to_csv_spark.sources.warc import write_warc_segments

    d = tmp_path / "warcs"
    write_warc_segments(
        (
            (i, f"https://cli.example/{i}", "2025-01-01T00:00:00Z",
             f"tok{i}a tok{i}b tok{i}c tok{i}d " .encode() * 3)
            for i in range(6)
        ),
        str(d),
    )
    out = tmp_path / "out"
    res = _run([
        "jobs/extract_job.py", "--warc", str(d), "--out", str(out),
        "--progress", str(tmp_path / "progress"), "--batch-id", "1",
        "--layout", "generic",
    ])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "pages extracted" in res.stdout, res.stdout[-500:]
    assert out.exists()


def test_curate_job_main_exact_mode(tmp_path):
    """The curate CLI prints its one-line JSON summary and writes keepers."""
    out = tmp_path / "cur"
    res = _run([
        "jobs/curate_job.py", "--documents",
        "/root/testdata/sf0.001/documents.parquet", "--out", str(out),
    ])
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "exact" and summary["n_kept"] > 0
    assert (out / "keepers").exists()
