"""Source fingerprints for the driver-verification rotation.

The rotation rule (operators/registry.py ``_DRIVER_VERIFIED``) is: a
query may only stay marked verified-green while the code it depends on
is byte-identical to what the driver verified. Rounds 1-3 enforced this
by hand, and round 3's diff showed why that fails: helper changes
(``_parse_series`` memoization, ``load_table`` conf) slipped under
still-green spatial queries (VERDICT r3 #1 / ADVICE r3).

This module automates it. A query's **fingerprint** is a hash over the
source of its defining module plus every package module that module
transitively imports (module granularity — coarser than a call graph,
so it can only over-flag, never under-flag). Fingerprints recorded at
verification time live in ``operators/_verified_fingerprints.json``;
``tests/test_registry.py`` fails whenever a ``_DRIVER_VERIFIED`` entry's
current fingerprint drifts from its recorded one, forcing the diff
author to either re-expose the query or deliberately re-record (a
visible act in the JSON's git diff — e.g. for result-invariant infra
like the cache-release hook).

Record/refresh:  python -m sql_interface_to_xml_database_for_spatial_operations_spark.staleness
"""

from __future__ import annotations

import ast
import hashlib
import json
import os

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
FINGERPRINT_PATH = os.path.join(_PKG_DIR, "operators", "_verified_fingerprints.json")


def _package_modules() -> dict[str, str]:
    """Dotted module name → source text, for every .py in the package."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(_PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, _PKG_DIR)
            parts = rel[: -len(".py")].split(os.sep)
            if parts[-1] == "__init__":
                parts = parts[:-1]
            name = ".".join([_PKG_NAME, *parts]) if parts else _PKG_NAME
            with open(path, encoding="utf-8") as fh:
                out[name] = fh.read()
    return out


def _imports_of(mod: str, src: str, modules: set[str]) -> set[str]:
    """Package-internal modules imported anywhere in ``mod`` (including
    function-local imports — ingest.py imports readers lazily)."""
    deps: set[str] = set()

    def add(target: str, names: list[str] | None = None) -> None:
        if target in modules:
            deps.add(target)
        for n in names or []:
            if f"{target}.{n}" in modules:
                deps.add(f"{target}.{n}")

    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name == _PKG_NAME or a.name.startswith(_PKG_NAME + "."):
                    add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                # resolve relative to the module's package
                parts = mod.split(".")
                if mod in modules and _is_package(mod):
                    anchor = parts
                else:
                    anchor = parts[:-1]
                anchor = anchor[: len(anchor) - (node.level - 1)]
                base = ".".join(anchor)
                target = f"{base}.{node.module}" if node.module else base
            elif node.module and (
                node.module == _PKG_NAME or node.module.startswith(_PKG_NAME + ".")
            ):
                target = node.module
            else:
                continue
            add(target, [a.name for a in node.names])
    return deps


def _is_package(mod: str) -> bool:
    rel = mod[len(_PKG_NAME) :].lstrip(".").replace(".", os.sep)
    return os.path.isdir(os.path.join(_PKG_DIR, rel)) if rel else True


def _closure(start: str, modules: dict[str, str]) -> list[str]:
    names = set(modules)
    seen, stack = set(), [start]
    while stack:
        m = stack.pop()
        if m in seen or m not in modules:
            continue
        seen.add(m)
        stack.extend(_imports_of(m, modules[m], names) - seen)
    return sorted(seen)


def fingerprint_of_module(mod: str, modules: dict[str, str] | None = None) -> str:
    """sha256 over (name, source-sha) of ``mod``'s transitive package
    import closure — drifts iff any source byte a query can execute
    through drifts."""
    modules = modules if modules is not None else _package_modules()
    h = hashlib.sha256()
    for m in _closure(mod, modules):
        h.update(m.encode())
        h.update(hashlib.sha256(modules[m].encode()).digest())
    return h.hexdigest()


def current_fingerprints() -> dict[str, str]:
    """query name → fingerprint for every registered query."""
    from .operators import registry

    modules = _package_modules()
    by_mod: dict[str, str] = {}
    out: dict[str, str] = {}
    for name, q in registry.QUERIES.items():
        mod = q.fn.__module__
        if mod not in by_mod:
            by_mod[mod] = fingerprint_of_module(mod, modules)
        out[name] = by_mod[mod]
    return out


def recorded_fingerprints() -> dict[str, str]:
    if not os.path.exists(FINGERPRINT_PATH):
        return {}
    with open(FINGERPRINT_PATH, encoding="utf-8") as fh:
        return json.load(fh)


def record() -> dict[str, str]:
    """(Re)record fingerprints for the queries currently marked verified.
    Run this when updating ``_DRIVER_VERIFIED`` after a driver round, or
    to deliberately accept a result-invariant infra change."""
    from .operators import registry

    cur = current_fingerprints()
    data = {n: cur[n] for n in sorted(registry._DRIVER_VERIFIED)}
    with open(FINGERPRINT_PATH, "w", encoding="utf-8") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return data


if __name__ == "__main__":
    from .operators import load_all

    load_all()  # registration side effects populate the registry
    print(f"recorded {len(record())} fingerprints -> {FINGERPRINT_PATH}")
