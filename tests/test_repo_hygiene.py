"""Repo-root hygiene: no stray artifacts in the tracked tree.

Round 12 accidentally committed a shell-redirect file whose name contained
double quotes (impossible to check out on Windows). This guard pins the
tracked top level to an explicit allowlist so a botched redirect can't
silently land again.
"""

from __future__ import annotations

import re
import subprocess
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

# Top-level entries that may legitimately be tracked. Driver artifacts are
# matched by pattern; everything else is an exact name.
ALLOWED_EXACT = {
    ".claude",
    ".gitignore",
    "ADVICE.md",
    "BASELINE.json",
    "BASELINE.md",
    "COPYCHECK.json",
    "COVERAGE.md",
    "FIXTURES.md",
    "LEAKCHECK.json",
    "PAPERS.md",
    "PROGRESS.jsonl",
    "README.md",
    "SCALING.md",
    "SNIPPETS.md",
    "SURVEY.md",
    "TESTDATA.md",
    "VERDICT.md",
    "__spark_entry__.py",
    "bench.py",
    "bench_last.json",  # full per-run artifact bench.py drops beside itself
    "energy_datalake_solution_spark",
    "plans",  # committed explain('formatted') evidence (plans/r<N>/)
    "tests",
}
ALLOWED_PATTERNS = (
    re.compile(r"^BENCH_r\d+\.json$"),
    re.compile(r"^CORRECTNESS_r\d+\.json$"),
    # optimization-round deliverable (one per optimization round)
    re.compile(r"^OPTIMIZATION_r\d+\.md$"),
)

# Characters illegal in Windows filenames (subset of the full set that
# could plausibly appear via a botched shell redirect).
WINDOWS_ILLEGAL = re.compile(r'["<>|?*]')


def _tracked_top_level() -> list[str]:
    out = subprocess.run(
        ["git", "ls-files", "-z"],
        cwd=REPO_ROOT,
        capture_output=True,
        check=True,
    ).stdout.decode()
    return sorted({p.split("/", 1)[0] for p in out.split("\0") if p})


def test_tracked_top_level_is_allowlisted():
    unexpected = [
        name
        for name in _tracked_top_level()
        if name not in ALLOWED_EXACT
        and not any(pat.match(name) for pat in ALLOWED_PATTERNS)
    ]
    assert unexpected == [], f"unexpected tracked top-level entries: {unexpected}"


def test_no_windows_illegal_filenames_tracked():
    out = subprocess.run(
        ["git", "ls-files", "-z"],
        cwd=REPO_ROOT,
        capture_output=True,
        check=True,
    ).stdout.decode()
    bad = [p for p in out.split("\0") if p and WINDOWS_ILLEGAL.search(p)]
    assert bad == [], f"tracked paths illegal on Windows: {bad}"
