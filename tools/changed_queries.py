"""Mechanically derive the workload queries whose behavior could have
changed in a git commit range — the enforcement half of the registry's
RULE 1 (every changed query is pinned into the externally-checked
window; see ``workload/registry.py``).

The round-8 review flagged the hand-maintained ``_CHANGED_THIS_ROUND``
list as the rotation policy's weak point: an omission silently
violates RULE 1. This tool closes it:

1. the round boundary is the newest commit whose subject matches
   ``round N:`` (the driver's round-close commit); the round's changes
   are ``git diff --name-only <boundary>..HEAD``;
2. each changed ``kaj_query_engine_spark/**.py`` file maps to a module;
3. a query is DERIVED-CHANGED when any changed module is in the static
   import closure of the module that registers it (imports are
   collected from the whole AST, so function-local imports count).

Module-closure granularity is deliberately conservative: a change to
``streaming/ops.py`` pins every streaming query, not just the one
whose code path moved — a superset can cost a verification slot, an
omission can hide a regression. ``tests/test_registry_rotation.py``
pins ``_CHANGED_THIS_ROUND ⊇ derived``, so the hand list (which may
add entries, e.g. for data-fixture changes git can't see) can never
silently under-cover the round's diff.

Usage: python tools/changed_queries.py [git-range]
Prints one line per derived query with the changed modules that pin it.
"""

from __future__ import annotations

import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "kaj_query_engine_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def round_boundary() -> str | None:
    """Newest commit whose subject is a driver round-close marker."""
    out = _git(
        "log", "--grep", r"^round [0-9]\+:", "-1", "--format=%H"
    ).strip()
    return out or None


def default_range() -> str | None:
    # single-rev form: git diffs boundary against the WORKING TREE, so
    # uncommitted edits count as changed too — a query touched but not
    # yet committed must not escape the pin
    return round_boundary()


def changed_modules(rng: str) -> set[str]:
    """Package modules touched in the range (dotted names)."""
    out = _git("diff", "--name-only", rng, "--", f"{PKG}/")
    mods = set()
    for line in out.splitlines():
        if line.endswith(".py"):
            mods.add(_path_to_module(line))
    return mods - _LEAVES


def _path_to_module(rel: str) -> str:
    parts = Path(rel).with_suffix("").parts
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _module_file(mod: str) -> Path | None:
    base = REPO / Path(*mod.split("."))
    if base.with_suffix(".py").exists():
        return base.with_suffix(".py")
    if (base / "__init__.py").exists():
        return base / "__init__.py"
    return None


# Closure LEAVES: modules that are registration/ordering plumbing,
# not dataflow — workload/registry.py's all_queries() imports EVERY
# workload module to populate the registry, which would collapse every
# closure to the whole package and derive all 83 queries changed for
# any one-line diff; and every workload module imports ``register``
# from it, so counting the registry itself as a changed module would
# equally pin all 83 (its docstring says it: ordering of verification
# attention only, never a behavior change — and
# tests/test_registry_rotation.py is the check ON the registry).
_LEAVES = {f"{PKG}.workload.registry"}


def module_imports(mod: str) -> set[str]:
    """In-package modules this module imports, anywhere in its AST
    (function-local imports included — the workload files' dominant
    pattern for heavy dependencies)."""
    if mod in _LEAVES:
        return set()
    f = _module_file(mod)
    if f is None:
        return set()
    tree = ast.parse(f.read_text())
    pkg_parts = mod.split(".")[:-1] if f.name != "__init__.py" else mod.split(".")
    out: set[str] = set()

    def add(name: str) -> None:
        if name.startswith(PKG) and _module_file(name) is not None:
            out.add(name)

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative import
                base = pkg_parts[: len(pkg_parts) - node.level + 1]
                stem = ".".join(base + ([node.module] if node.module else []))
            else:
                stem = node.module or ""
            add(stem)
            for a in node.names:  # `from pkg.sub import module` form
                add(f"{stem}.{a.name}")
    return out


def import_closure(mod: str, _memo: dict[str, set[str]] | None = None) -> set[str]:
    seen: set[str] = set()
    stack = [mod]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(module_imports(m))
    return seen


def query_modules() -> dict[str, str]:
    """{query name: dotted module that registers it}."""
    sys.path.insert(0, str(REPO))
    from kaj_query_engine_spark.workload.registry import all_queries

    return {n: q.spark.__module__ for n, q in all_queries().items()}


def derive(rng: str | None = None) -> dict[str, list[str]]:
    """{derived-changed query: sorted changed modules pinning it}."""
    rng = rng or default_range()
    if rng is None:
        return {}
    changed = changed_modules(rng)
    if not changed:
        return {}
    closures: dict[str, set[str]] = {}
    out: dict[str, list[str]] = {}
    for name, mod in query_modules().items():
        if mod not in closures:
            closures[mod] = import_closure(mod)
        hits = sorted(changed & closures[mod])
        if hits:
            out[name] = hits
    return out


if __name__ == "__main__":
    rng = sys.argv[1] if len(sys.argv) > 1 else default_range()
    print(f"# range: {rng}")
    d = derive(rng)
    for name, hits in sorted(d.items()):
        print(f"{name}: {', '.join(hits)}")
    print(f"# {len(d)} derived-changed queries")
