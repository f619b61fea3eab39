"""Static style/lint gate (the reference ctest style-check analogue,
ref tests/style-check.c + tests/CMakeLists.txt:95-123).

The reference gates every source file on mechanical style errors (CRLF,
tabs, trailing whitespace, over-long lines) plus a clang static-analyzer
pass. This is the Python/C++ equivalent on the standard library alone:
text rules mirror style-check.c; the "analyzer" half is an AST pass for
the defect classes Python's compiler does not reject (bare except,
mutable default arguments, duplicate top-level definitions, undefined
names in __all__).
"""

import ast
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PY_FILES = sorted(
    list((REPO / "rtl_433_tpu").rglob("*.py"))
    + list((REPO / "tools").glob("*.py"))
    + [REPO / "bench.py", REPO / "__graft_entry__.py"]
    + list((REPO / "tests").glob("*.py")))
CPP_FILES = sorted((REPO / "native").glob("*.cpp"))

# mirror style-check.c thresholds; Python sources follow PEP 8's 79 but
# docstring tables/URLs get the reference's hard cap instead
MAX_LINE = 300


def _text_errors(path):
    errs = []
    raw = path.read_bytes()
    for i, line in enumerate(raw.split(b"\n"), 1):
        if line.endswith(b"\r"):
            errs.append(f"{path.name}:{i}: CRLF line ending")
            line = line[:-1]
        if len(line) > MAX_LINE:
            errs.append(f"{path.name}:{i}: line longer than {MAX_LINE}")
        if line != line.rstrip():
            errs.append(f"{path.name}:{i}: trailing whitespace")
        stripped = line.lstrip(b" ")
        if stripped.startswith(b"\t") and path.suffix == ".py":
            errs.append(f"{path.name}:{i}: tab indentation")
    return errs


def test_text_style():
    errs = []
    for p in PY_FILES + CPP_FILES:
        errs += _text_errors(p)
    assert not errs, "\n".join(errs[:40])


def test_python_compiles():
    """Every source must byte-compile (the READ-error analogue)."""
    for p in PY_FILES:
        compile(p.read_text(), str(p), "exec")


def _ast_errors(path, tree):
    errs = []
    seen_defs = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen_defs:
                errs.append(
                    f"{path.name}:{node.lineno}: duplicate top-level "
                    f"definition of {node.name!r} "
                    f"(first at :{seen_defs[node.name]})")
            seen_defs[node.name] = node.lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            errs.append(f"{path.name}:{node.lineno}: bare except")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    errs.append(f"{path.name}:{d.lineno}: mutable default "
                                f"argument in {node.name}()")
    return errs


def test_ast_lint():
    errs = []
    for p in PY_FILES:
        tree = ast.parse(p.read_text())
        errs += _ast_errors(p, tree)
    assert not errs, "\n".join(errs[:40])


def test_all_exports_exist():
    """__all__ names must resolve (a common undefined-name class)."""
    for p in (REPO / "rtl_433_tpu").rglob("*.py"):
        tree = ast.parse(p.read_text())
        names = {n.name for n in ast.walk(tree)
                 if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                                   ast.ClassDef))}
        names |= {t.id for n in ast.walk(tree)
                  if isinstance(n, ast.Assign)
                  for t in n.targets if isinstance(t, ast.Name)}
        names |= {a.asname or a.name.split(".")[0]
                  for n in ast.walk(tree)
                  if isinstance(n, (ast.Import, ast.ImportFrom))
                  for a in n.names}
        for node in tree.body:
            if (isinstance(node, ast.Assign)
                    and any(isinstance(t, ast.Name) and t.id == "__all__"
                            for t in node.targets)
                    and isinstance(node.value, (ast.List, ast.Tuple))):
                for elt in node.value.elts:
                    if isinstance(elt, ast.Constant):
                        assert elt.value in names, (
                            f"{p.name}: __all__ exports undefined name "
                            f"{elt.value!r}")
