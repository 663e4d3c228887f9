"""Lint gate as a test — the reference denies clippy pedantic+nursery in CI
(reference: .github/workflows/ci.yml:31, justfile:12-16); this enforces the
from-scratch AST linter (tools/lint.py) over the whole repo."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py")],
        cwd=REPO, capture_output=True, text=True,
    )
    assert proc.returncode == 0, f"lint findings:\n{proc.stdout}"


def test_lint_catches_seeded_defects(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import os\n"
        "import os\n"
        "def f(x=[]):\n"
        "    try:\n"
        "        return x == None\n"
        "    except:\n"
        "        pass\n"
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py"), str(bad)],
        cwd=REPO, capture_output=True, text=True,
    )
    assert proc.returncode != 0
    for rule in ("UNUSED-IMPORT", "REDEF-IMPORT", "MUTABLE-DEFAULT",
                 "EQ-NONE", "BARE-EXCEPT"):
        assert rule in proc.stdout, (rule, proc.stdout)
