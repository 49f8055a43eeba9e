#!/usr/bin/env python
"""Per-query source fingerprints — the COMPUTED rework detector.

The driver samples only the first 50 ``queries()`` entries per round,
so queries reworked after their newest driver row must be re-queued by
hand. Round 7's verdict caught the failure mode: q90 was rewritten in
round 6 (shared-source change in ``read_documents_stream``) but the
hand-maintained ``_REWORKED_LAST_ROUND`` list missed it, leaving its
only green row pre-rework. Hand lists miss shared-source reworks by
construction; this module computes them instead.

A query's fingerprint is a sha256 over the AST dumps (comments and
docstrings stripped — formatting-only edits don't count as reworks) of
the query FUNCTION plus the module-level helpers it references
(transitively, within its registering module) plus the full module
closure of every package-internal module those names actually import.
Function-level slicing matters: query modules are shared (dedup_q.py
registers ~25 queries), so a whole-module hash would flag every
sibling of an edited helper — the r8 dry run showed a 3-file operator
diff flagging 55 queries at module granularity vs the true dependents
at function granularity. Anything the slicer can't resolve statically
(dynamic dispatch, renamed functions at old revs) falls back to the
whole-module fingerprint — over-selection is the safe direction.
``QUERY_FINGERPRINTS.json`` snapshots,
per query, the fingerprint at the commit its newest verified driver
row (or judge full-sweep) ran against. Any query whose CURRENT
fingerprint differs from its snapshot has been reworked since its
evidence and must sit inside ``_PRIORITY[:50]`` — asserted by
tests/test_cli.py::test_reworked_queries_front_loaded.

Maintenance (round start, BEFORE editing anything):

    python scripts/fingerprints.py refresh <rev> <round>

updates the snapshot for every query with a row in
CORRECTNESS_r<round>.json to its fingerprint at <rev> (the previous
round's end-of-round commit — the code the driver actually ran; this
holds because the driver runs its correctness gate exactly ONCE per
round, against that final commit — if it ever starts sampling
mid-round, the pin must move to the sampled commit).
``python scripts/fingerprints.py diff`` prints the current rework set.
NEWLY REGISTERED queries are absent from the snapshot and therefore
invisible to the diff — they must be hand-declared in _NEVER_ROWED,
which tests/test_cli.py cross-checks against the snapshot.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import subprocess
import sys
from collections.abc import Callable

PKG = "anime_data_pipeline_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "QUERY_FINGERPRINTS.json")

Loader = Callable[[str], bytes | None]  # repo-relative path -> source or None


def worktree_loader(relpath: str) -> bytes | None:
    try:
        with open(os.path.join(REPO, relpath), "rb") as fh:
            return fh.read()
    except OSError:
        return None


def rev_loader(rev: str) -> Loader:
    def load(relpath: str) -> bytes | None:
        res = subprocess.run(
            ["git", "-C", REPO, "show", f"{rev}:{relpath}"],
            capture_output=True,
        )
        return res.stdout if res.returncode == 0 else None

    return load


def _mod_relpath(mod: str) -> str:
    return mod.replace(".", "/") + ".py"


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    """Drop docstring Expr nodes so citation/prose edits aren't reworks."""
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return tree


def _resolve_import_from(node: ast.ImportFrom, current_mod: str) -> str:
    """ImportFrom → the dotted module it names, with relative levels
    resolved against ``current_mod``'s package. The single home for
    this logic — three walkers share it, and a divergence between
    their copies would silently skew fingerprints."""
    if node.level:  # relative: from .x / from ..ops.x
        base = current_mod.split(".")[: -node.level]
        return ".".join(base + ([node.module] if node.module else []))
    return node.module or ""


def _is_pkg(mod: str) -> bool:
    return mod == PKG or mod.startswith(PKG + ".")


def _internal_imports(tree: ast.AST, current_mod: str, exists) -> set[str]:
    """Package-internal modules statically imported by ``tree``.

    ``from pkg.a import b`` resolves b as a submodule when pkg/a/b.py
    exists, else falls back to pkg/a (the defining module). Relative
    imports resolve against ``current_mod``'s package.
    """
    out: set[str] = set()

    def add(mod: str) -> None:
        if _is_pkg(mod):
            if exists(_mod_relpath(mod)):
                out.add(mod)
            elif exists(mod.replace(".", "/") + "/__init__.py"):
                out.add(mod + ".__init__")

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            mod = _resolve_import_from(node, current_mod)
            if not _is_pkg(mod):
                continue
            for alias in node.names:
                sub = f"{mod}.{alias.name}"
                if exists(_mod_relpath(sub)):
                    out.add(sub)
                else:
                    add(mod)
    return out


def module_closure(root_mod: str, loader: Loader) -> dict[str, bytes]:
    """{module: source} for root plus transitively imported pkg modules."""
    sources: dict[str, bytes] = {}
    stack = [root_mod]
    while stack:
        mod = stack.pop()
        if mod in sources:
            continue
        relpath = (
            _mod_relpath(mod)
            if not mod.endswith(".__init__")
            else mod[: -len(".__init__")].replace(".", "/") + "/__init__.py"
        )
        src = loader(relpath)
        if src is None:
            continue
        sources[mod] = src

        def _exists(rp: str) -> bool:
            return loader(rp) is not None

        try:
            tree = ast.parse(src)
        except SyntaxError:
            continue
        stack.extend(_internal_imports(tree, mod, _exists) - set(sources))
    return sources


def fingerprint_module(root_mod: str, loader: Loader, _cache: dict | None = None) -> str:
    if _cache is not None and root_mod in _cache:
        return _cache[root_mod]
    h = hashlib.sha256()
    closure = module_closure(root_mod, loader)
    for mod in sorted(closure):
        try:
            dump = ast.dump(_strip_docstrings(ast.parse(closure[mod])))
        except SyntaxError:
            dump = closure[mod].decode("utf-8", "replace")
        h.update(mod.encode())
        h.update(b"\x00")
        h.update(dump.encode())
        h.update(b"\x00")
    fp = h.hexdigest()
    if _cache is not None:
        _cache[root_mod] = fp
    return fp


def query_roots() -> dict[str, tuple[str, str]]:
    """{query_name: (registering module, function qualname)} from the
    live registry (the mapping is a property of the CURRENT tree;
    historical revs only need module SOURCES, which the loader
    provides — a function renamed since falls back to module fp)."""
    sys.path.insert(0, REPO)
    from anime_data_pipeline_spark.registry import all_queries

    return {
        name: (fn.__module__, fn.__qualname__) for name, fn in all_queries().items()
    }


def _import_deps(node, current_mod: str, exists):
    """(modules, (module, name) pairs) introduced by one import stmt —
    used for FUNCTION-LOCAL imports, which bind nothing at module level
    but are the dominant style inside query functions."""
    mods: set[str] = set()
    names: set[tuple[str, str]] = set()
    if isinstance(node, ast.Import):
        for alias in node.names:
            if _is_pkg(alias.name):
                mods.add(alias.name)
    elif isinstance(node, ast.ImportFrom):
        mod = _resolve_import_from(node, current_mod)
        if _is_pkg(mod):
            for alias in node.names:
                sub = f"{mod}.{alias.name}"
                if exists(_mod_relpath(sub)):
                    mods.add(sub)
                else:
                    names.add((mod, alias.name))
    return mods, names


def _top_level_bindings(tree: ast.Module, current_mod: str, exists):
    """name → ('node', ast stmt) for module-level defs/assigns, or
    ('mod', dotted) for package-internal import bindings. External
    imports (pyspark, stdlib) are omitted — they don't fingerprint.
    Compound module-level statements (if/try/for/while/with — e.g. a
    ``try: IMPL = fast\nexcept ImportError: IMPL = slow`` feature
    gate) are flattened: a binding inside them is still module-level,
    and dropping it would UNDER-select (the failure direction this
    tool exists to prevent). The whole compound statement becomes the
    binding node, so editing EITHER branch changes the fingerprint."""
    bindings: dict[str, tuple[str, object]] = {}

    def mod_binding(name: str, dotted: str) -> None:
        if _is_pkg(dotted):
            bindings[name] = ("mod", dotted)

    def visit(node, bind_node) -> None:
        """``bind_node`` is what a name binds TO — the top-level stmt
        itself, so compound branches hash as a unit."""
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bindings[node.name] = ("node", bind_node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        bindings[n.id] = ("node", bind_node)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                mod_binding(alias.asname or alias.name.split(".")[0], alias.name)
        elif isinstance(node, ast.ImportFrom):
            mod = _resolve_import_from(node, current_mod)
            if not _is_pkg(mod):
                return
            for alias in node.names:
                sub = f"{mod}.{alias.name}"
                bound = alias.asname or alias.name
                if exists(_mod_relpath(sub)):
                    mod_binding(bound, sub)
                else:
                    # a NAME inside a package module: fingerprint the
                    # sliced name, not the whole module — query modules
                    # import helpers from each other, and a module-level
                    # fallback would flag every sibling query
                    bindings[bound] = ("name", (mod, alias.name))
        elif isinstance(node, (ast.If, ast.Try, ast.For, ast.While, ast.With)):
            for field in ("body", "orelse", "finalbody", "handlers"):
                for child in getattr(node, field, []) or []:
                    if isinstance(child, ast.ExceptHandler):
                        for c in child.body:
                            visit(c, bind_node)
                    else:
                        visit(child, bind_node)

    for node in tree.body:
        visit(node, node)
    return bindings


def fingerprint_query(
    mod: str, qualname: str, loader: Loader, cache: dict
) -> str:
    """Function-level slice fingerprint (see module docstring)."""
    key = ("q", mod, qualname)
    if key in cache:
        return cache[key]
    cache[key] = "<cycle>"  # deterministic token if name deps are circular
    src = loader(_mod_relpath(mod))
    parsed = None
    if src is not None and "." not in qualname:
        pkey = ("tree", mod)
        if pkey not in cache:
            try:
                tree = ast.parse(src)

                def _exists(rp: str, _ld=loader) -> bool:
                    return _ld(rp) is not None

                cache[pkey] = (tree, _top_level_bindings(tree, mod, _exists))
            except SyntaxError:
                cache[pkey] = None
        parsed = cache[pkey]
    target = None
    if parsed is not None:
        tree, bindings = parsed
        b = bindings.get(qualname)
        if b and b[0] == "node":
            target = b[1]
    if target is None:
        # dynamic registration / renamed at this rev → whole-module fp
        fp = fingerprint_module(mod, loader, cache)
        cache[key] = fp
        return fp

    included: list = []
    needed_mods: set[str] = set()
    needed_names: set[tuple[str, str]] = set()
    seen_ids: set[int] = set()
    seen_names: set[str] = set()
    stack = [target]
    while stack:
        node = stack.pop()
        if id(node) in seen_ids:
            continue
        seen_ids.add(id(node))
        included.append(node)
        for n in ast.walk(node):
            if isinstance(n, (ast.Import, ast.ImportFrom)) and n is not node:
                # function-local imports bind nothing at module level

                def _exists(rp: str, _ld=loader) -> bool:
                    return _ld(rp) is not None

                lm, ln = _import_deps(n, mod, _exists)
                needed_mods |= lm
                needed_names |= ln
            elif isinstance(n, ast.Name) and n.id not in seen_names:
                seen_names.add(n.id)
                b = bindings.get(n.id)
                if b is None:
                    continue
                if b[0] == "node":
                    stack.append(b[1])
                elif b[0] == "mod":
                    needed_mods.add(b[1])
                else:
                    needed_names.add(b[1])

    h = hashlib.sha256()
    for dump in sorted(
        ast.dump(_strip_docstrings(ast.parse(ast.unparse(n)))) for n in included
    ):
        h.update(dump.encode())
        h.update(b"\x00")
    for m in sorted(needed_mods):
        h.update(m.encode())
        h.update(fingerprint_module(m, loader, cache).encode())
        h.update(b"\x00")
    for m, name in sorted(needed_names):
        h.update(f"{m}:{name}".encode())
        h.update(fingerprint_query(m, name, loader, cache).encode())
        h.update(b"\x00")
    fp = h.hexdigest()
    cache[key] = fp
    return fp


def query_fingerprints(loader: Loader) -> dict[str, str]:
    cache: dict = {}
    memo: dict[str, bytes | None] = {}

    def cached_loader(relpath: str) -> bytes | None:
        if relpath not in memo:
            memo[relpath] = loader(relpath)
        return memo[relpath]

    return {
        name: fingerprint_query(mod, qualname, cached_loader, cache)
        for name, (mod, qualname) in query_roots().items()
    }


def load_snapshot() -> dict:
    with open(SNAPSHOT) as fh:
        return json.load(fh)


def reworked_since_snapshot() -> list[str]:
    """Queries whose current-tree fingerprint differs from the one at
    their newest verified driver row — the computed rework set."""
    snap = load_snapshot()["queries"]
    current = query_fingerprints(worktree_loader)
    return sorted(
        name
        for name, fp in current.items()
        if name in snap and snap[name]["fp"] != fp
    )


def _cmd_refresh(rev: str, rnd: int) -> None:
    rows_path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
    with open(rows_path) as fh:
        rowed = set(json.load(fh))
    at_rev = query_fingerprints(rev_loader(rev))
    try:
        snap = load_snapshot()
    except OSError:
        snap = {"queries": {}}
    # only queries that actually got a row move their pin; a new query
    # with no row yet stays out of the snapshot (the never-rowed guard
    # owns it until its first row lands)
    for name in sorted(at_rev):
        if name in rowed:
            snap["queries"][name] = {"fp": at_rev[name], "round": rnd}
    snap["note"] = (
        "fp = sha256 over docstring-stripped AST dumps of the query's "
        "module closure at the commit its newest verified row ran "
        "against; maintained by scripts/fingerprints.py refresh"
    )
    with open(SNAPSHOT, "w") as fh:
        json.dump(snap, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"snapshot updated: {len(rowed)} rowed queries -> round {rnd} @ {rev}")


def _cmd_init(rev: str, rnd: int) -> None:
    """Initialize EVERY query's snapshot at one rev (used once, at the
    round-7 end commit the judge's full-registry sweep verified).
    Queries whose registering function does not exist at the rev are
    SKIPPED — they were registered later, have no verified row, and
    belong to _NEVER_ROWED until their first row lands (pinning them
    at a rev that predates them would record a bogus fingerprint)."""
    loader = rev_loader(rev)
    cache: dict = {}
    memo: dict[str, bytes | None] = {}

    def cached_loader(relpath: str) -> bytes | None:
        if relpath not in memo:
            memo[relpath] = loader(relpath)
        return memo[relpath]

    at_rev: dict[str, str] = {}
    for name, (mod, qualname) in query_roots().items():
        src = cached_loader(_mod_relpath(mod))
        if src is None or (f"def {qualname}(" not in src.decode("utf-8", "replace")):
            print(f"  skipping {name}: not present at {rev} (never-rowed)")
            continue
        at_rev[name] = fingerprint_query(mod, qualname, cached_loader, cache)
    snap = {
        "queries": {n: {"fp": fp, "round": rnd} for n, fp in sorted(at_rev.items())}
    }
    with open(SNAPSHOT, "w") as fh:
        json.dump(snap, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"snapshot initialized: {len(at_rev)} queries @ {rev}")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "diff":
        for name in reworked_since_snapshot():
            print(name)
    elif len(sys.argv) == 4 and sys.argv[1] == "refresh":
        _cmd_refresh(sys.argv[2], int(sys.argv[3]))
    elif len(sys.argv) == 4 and sys.argv[1] == "init":
        _cmd_init(sys.argv[2], int(sys.argv[3]))
    else:
        print(__doc__)
        sys.exit(2)
