"""Examples run in CI (r10): the version-aware decontamination example
is the end-to-end reproducibility story of the versioning tier (r9
verdict #7) — it asserts its own invariants (monotone gates, pinned-v1
bit-identical replay) and a regression in versioning/decontaminate/
novelty composition fails it loudly. Run as a real subprocess so it
proves the example works exactly as a user would invoke it."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_version_decontam_example_runs():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "version_decontam.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"example failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "reproducibility: v1 gate replayed" in proc.stdout


def test_storage_tour_example_runs():
    """The storage tour demonstrates the content-addressed store,
    gated versioned releases (r10: the expectations contract refusing
    a NULL-payload release), and time travel — as a real subprocess."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "storage_tour.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"example failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "gate refused a bad release" in proc.stdout
    assert "time travel" in proc.stdout


def test_crawl_tour_example_runs():
    """Archive → warc source → HTML extraction → screen → contract-
    gated release, as a real subprocess (r10)."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "crawl_tour.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"example failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "after exact dedup: 500" in proc.stdout
    assert "release v1 committed: 500 rows" in proc.stdout


def test_contract_workflow_example_runs():
    """Deequ's suggest → human-trim → gate loop plus the release card's
    contract audit trail (r11), as a real subprocess."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "contract_workflow.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"example failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "gate refused a broken release" in proc.stdout
    assert "shipped UNGATED" in proc.stdout
