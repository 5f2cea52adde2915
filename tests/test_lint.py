"""Repo hygiene lints that pytest can enforce without external tools.

The round-8 advisor found two shadowed test definitions (F811): a
later ``def test_x`` silently replaced an earlier, richer one, so the
richer test never ran while the suite still counted "green".  flake8
is not in this container, so this is a minimal AST-based F811 check
over every Python file in the repo (tests AND package code).
"""
from __future__ import annotations

import ast
import collections
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _py_files():
    for sub in ("tests", "hfcommunity_spark", "tools"):
        root = REPO / sub
        if root.is_dir():
            yield from sorted(root.rglob("*.py"))
    for top in ("bench.py", "__spark_entry__.py"):
        p = REPO / top
        if p.is_file():
            yield p


def _dup_defs(path):
    """Duplicate function/class names in the same scope (F811-ish).

    Checks module top level and each class body; nested function
    scopes are independent and deliberate shadowing inside closures is
    not a thing this repo does.
    """
    tree = ast.parse(path.read_text(), filename=str(path))
    dups = []

    def deliberate_redef(node) -> bool:
        """Same-name defs that are legitimate Python: @property
        setter/deleter pairs, @typing.overload stacks, and
        singledispatch registrations."""
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            return False
        for d in node.decorator_list:
            txt = ast.unparse(d)
            if (
                txt.endswith((".setter", ".deleter", ".getter",
                              ".register"))
                or txt in ("overload", "typing.overload")
            ):
                return True
        return False

    def scan(body, where):
        seen = collections.Counter(
            n.name
            for n in body
            if isinstance(
                n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            )
            and not deliberate_redef(n)
        )
        dups.extend(
            f"{path.name}:{where}:{name} (x{cnt})"
            for name, cnt in seen.items()
            if cnt > 1
        )

    scan(tree.body, "<module>")
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            scan(node.body, node.name)
    return dups


def test_no_shadowed_definitions():
    bad = []
    for path in _py_files():
        bad.extend(_dup_defs(path))
    assert not bad, f"shadowed (F811) definitions: {bad}"
