"""Examples run in CI (r10): the version-aware decontamination example
is the end-to-end reproducibility story of the versioning tier (r9
verdict #7) — it asserts its own invariants (monotone gates, pinned-v1
bit-identical replay) and a regression in versioning/decontaminate/
novelty composition fails it loudly. Run as a real subprocess so it
proves the example works exactly as a user would invoke it.

r15 (suite-wall item): the four subprocesses LAUNCH at module import —
i.e. during collection, minutes before this module's tests execute —
and the tests only JOIN and assert. Each example still runs exactly as
a user would invoke it (same argv, cwd, interpreter); the ~5 minutes
of example wall time now overlaps the rest of the suite instead of
serializing after it, which is most of what kept the full run outside
the driver's verify window."""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXAMPLES = (
    "version_decontam.py",
    "storage_tour.py",
    "crawl_tour.py",
    "contract_workflow.py",
)


def _launch(script: str):
    out = tempfile.NamedTemporaryFile(
        mode="w+", suffix=f"_{script}.out", delete=False
    )
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(REPO, "examples", script),
            "/root/testdata/sf0.001",
        ],
        stdout=out,
        stderr=subprocess.STDOUT,
        text=True,
        cwd=REPO,
    )
    return proc, out


_PROCS = {s: _launch(s) for s in _EXAMPLES}


def _reap():
    # collection-only / deselected runs never call _join: kill whatever
    # is still running and drop the temp files so nothing leaks past
    # the pytest process
    for proc, out in _PROCS.values():
        if proc.poll() is None:
            proc.kill()
        proc.wait()
        out.close()
        try:
            os.unlink(out.name)
        except OSError:
            pass


import atexit

atexit.register(_reap)


def _join(script: str) -> str:
    proc, out = _PROCS[script]
    try:
        rc = proc.wait(timeout=600)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        rc = -9
    out.flush()
    with open(out.name) as fh:
        text = fh.read()
    os.unlink(out.name)
    assert rc == 0, f"example {script} failed\noutput:\n{text[-4000:]}"
    return text


def test_version_decontam_example_runs():
    assert "reproducibility: v1 gate replayed" in _join("version_decontam.py")


def test_storage_tour_example_runs():
    """The storage tour demonstrates the content-addressed store,
    gated versioned releases (r10: the expectations contract refusing
    a NULL-payload release), and time travel — as a real subprocess."""
    text = _join("storage_tour.py")
    assert "gate refused a bad release" in text
    assert "time travel" in text


def test_crawl_tour_example_runs():
    """Archive → warc source → HTML extraction → screen → contract-
    gated release, as a real subprocess (r10)."""
    text = _join("crawl_tour.py")
    assert "after exact dedup: 500" in text
    assert "release v1 committed: 500 rows" in text


def test_contract_workflow_example_runs():
    """Deequ's suggest → human-trim → gate loop plus the release card's
    contract audit trail (r11), as a real subprocess."""
    text = _join("contract_workflow.py")
    assert "gate refused a broken release" in text
    assert "shipped UNGATED" in text
