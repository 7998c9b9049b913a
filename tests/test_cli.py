"""Launcher CLI contract (r5 review batch 6): the argparse guards fire
before any Spark work, and plain-python invocation can import the package
(the scripts bootstrap the repo root onto sys.path — the documented
spark-submit --py-files launch otherwise masked a broken import).

All legs are subprocess-level and Spark-free (guards error pre-import),
so they run in milliseconds.
"""
from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run(script: str, *args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        capture_output=True,
        text=True,
        cwd="/tmp",  # NOT the repo root: proves the sys.path bootstrap
        timeout=60,
    )


def test_run_corpus_rejects_closure_without_verify():
    p = _run(
        "run_corpus.py", "--out", "/tmp/x",
        "--near-dup-closure", "--no-verify-jaccard",
    )
    assert p.returncode == 2
    assert "verified-pair" in p.stderr


def test_run_corpus_rejects_extraction_flags_with_extracted():
    for flag in ("--use-ocr", "--main-content", "--warc"):
        p = _run(
            "run_corpus.py", "--extracted", "/tmp/x", "--out", "/tmp/y", flag,
        )
        assert p.returncode == 2, flag
        assert "--extracted skips" in p.stderr, flag


def test_run_corpus_requires_input():
    # the input check fires pre-session (no JVM spin-up for a usage error)
    p = _run("run_corpus.py", "--out", "/tmp/y")
    assert p.returncode == 2
    assert "need --pages or --extracted" in p.stderr


def test_launcher_bootstrap_makes_package_importable():
    """Executing a launcher's module level (the sys.path bootstrap) must
    make the package importable from ANY cwd — plain-python invocation
    previously died on the package import because only scripts/ was on
    sys.path (spark-submit --py-files masked it)."""
    for script in ("run_corpus.py", "run_pipeline.py", "iceberg_smoke.py"):
        code = (
            "import importlib.util, sys\n"
            f"spec = importlib.util.spec_from_file_location('l', "
            f"{str(REPO / 'scripts' / script)!r})\n"
            "m = importlib.util.module_from_spec(spec)\n"
            "spec.loader.exec_module(m)\n"
            "import universal_text_extractor_spark\n"
            "print('BOOTSTRAP_OK')\n"
        )
        p = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, cwd="/tmp", timeout=60,
        )
        assert p.returncode == 0, (script, p.stderr[-500:])
        assert "BOOTSTRAP_OK" in p.stdout, script


def test_run_pipeline_requires_pages():
    p = _run("run_pipeline.py", "--out", "/tmp/y")
    assert p.returncode == 2
    assert "--pages" in p.stderr
