"""The lint gate runs inside the suite so `make tests` keeps the tree clean
(the reference enforces flake8+mypy in CI — .github/workflows/linter.yml;
this environment ships neither, so tools/lint.py's built-in AST pass is the
always-on floor: syntax, 100-col lines, tabs/trailing whitespace, unused
imports)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_repo_lints_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py"), "--builtin-only"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_lint_catches_violations(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("import os\nimport sys\nprint(sys.argv)\n"
                   + "x = 1  " + "\n"            # trailing whitespace
                   + "y = '" + "a" * 120 + "'\n")  # long line
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import lint

        findings = lint.builtin_pass([bad.resolve()])
    finally:
        sys.path.pop(0)
    joined = "\n".join(findings)
    assert "unused import 'os'" in joined
    assert "line too long" in joined
    assert "trailing whitespace" in joined
    assert not any("sys" in f for f in findings)


def test_package_ships_typing_marker():
    assert (REPO / "demucs_tpu" / "py.typed").exists()
    assert (REPO / "mypy.ini").exists()
    assert "py.typed" in (REPO / "setup.py").read_text()
