#!/usr/bin/env python
"""First-party lint driver (`make lint`) — no `|| true`, a finding fails.

The reference enforces flake8 + mypy in CI (/root/reference/Makefile
`linter` target, setup.cfg, .github/workflows/linter.yml). This
environment has neither tool installed and no network, so the target is
honest about what runs where:

- flake8 and mypy run whenever they are importable (networked dev boxes,
  CI) with the configs in setup.cfg / mypy.ini;
- a built-in static pass ALWAYS runs: syntax (ast.parse), line length
  (100, the reference's setup.cfg limit), tabs / trailing whitespace, and
  AST-level unused-import detection.

`# noqa` on a line suppresses built-in findings for that line, matching
flake8's convention so one annotation serves both passes.
"""

from __future__ import annotations

import argparse
import ast
import importlib.util
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MAX_LINE = 100
DEFAULT_TARGETS = ("demucs_tpu", "tools", "tests", "bench.py",
                   "__graft_entry__.py", "hubconf.py", "setup.py")


def _iter_py(targets) -> list:
    out = []
    for t in targets:
        p = REPO / t
        if p.is_dir():
            out.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            out.append(p)
    return out


def _noqa(line: str) -> bool:
    return "# noqa" in line or "#noqa" in line


class _ImportUsage(ast.NodeVisitor):
    """Collect import bindings and every name load, module-wide."""

    def __init__(self):
        self.imports = {}  # name -> (lineno, display)
        self.used = set()

    def visit_Import(self, node):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imports[name] = (node.lineno, alias.name)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self.imports[name] = (node.lineno, f"{node.module}.{alias.name}")

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    def visit_Constant(self, node):
        # String annotations / docstring cross-references can legitimately
        # be the only mention of an import ("jax.sharding.Mesh" in a quoted
        # annotation): count dotted roots that appear in string constants.
        if isinstance(node.value, str):
            for tok in node.value.replace("[", " ").replace("]", " ").split():
                self.used.add(tok.split(".")[0].strip("\"'(),:"))


def builtin_pass(files) -> list:
    findings = []
    for path in files:
        try:
            rel = path.relative_to(REPO)
        except ValueError:
            rel = path
        try:
            text = path.read_text()
        except UnicodeDecodeError as err:
            findings.append(f"{rel}:0: unreadable ({err})")
            continue
        lines = text.splitlines()
        try:
            tree = ast.parse(text, filename=str(rel))
        except SyntaxError as err:
            findings.append(f"{rel}:{err.lineno}: syntax error: {err.msg}")
            continue
        for i, line in enumerate(lines, 1):
            if _noqa(line):
                continue
            if len(line) > MAX_LINE:
                findings.append(f"{rel}:{i}: line too long ({len(line)} > {MAX_LINE})")
            if line.rstrip() != line:
                findings.append(f"{rel}:{i}: trailing whitespace")
            if "\t" in line:
                findings.append(f"{rel}:{i}: tab character")
        # Unused imports: skipped for __init__.py (re-export surface) and
        # conftest.py (fixture side-effect imports).
        if path.name in ("__init__.py", "conftest.py"):
            continue
        usage = _ImportUsage()
        usage.visit(tree)
        for name, (lineno, display) in sorted(usage.imports.items(),
                                              key=lambda kv: kv[1][0]):
            if name in usage.used or name == "_":
                continue
            if lineno <= len(lines) and _noqa(lines[lineno - 1]):
                continue
            findings.append(f"{rel}:{lineno}: unused import {display!r} (as {name})")
    return findings


def _have(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("targets", nargs="*", default=list(DEFAULT_TARGETS))
    parser.add_argument("--builtin-only", action="store_true",
                        help="skip flake8/mypy even if installed")
    args = parser.parse_args(argv)

    files = _iter_py(args.targets)
    failed = False

    findings = builtin_pass(files)
    if findings:
        failed = True
        print(f"builtin lint: {len(findings)} finding(s)")
        for f in findings:
            print(f"  {f}")
    else:
        print(f"builtin lint: OK ({len(files)} files)")

    if not args.builtin_only and _have("flake8"):
        rc = subprocess.run(
            [sys.executable, "-m", "flake8", f"--max-line-length={MAX_LINE}",
             *args.targets], cwd=REPO).returncode
        print(f"flake8: {'OK' if rc == 0 else 'FAILED'}")
        failed |= rc != 0
    else:
        print("flake8: not installed here — runs on networked envs/CI")

    if not args.builtin_only and _have("mypy"):
        rc = subprocess.run(
            [sys.executable, "-m", "mypy", "--config-file", "mypy.ini",
             "demucs_tpu"], cwd=REPO).returncode
        print(f"mypy: {'OK' if rc == 0 else 'FAILED'}")
        failed |= rc != 0
    else:
        print("mypy: not installed here — runs on networked envs/CI")

    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
