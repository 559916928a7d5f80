"""Evidence-freshness ledger for the query registry.

VERDICT r4 item #2/"Next round" #4: the claim "code unchanged since
last green driver row" used to live in a registry comment; this module
makes it machine-checked. For every registered query we record, at the
time of its last green row in a driver CORRECTNESS_r{N}.json:

  * ``fingerprint`` — sha256 of the query's OWN definition: the
    decorated function's source segment (decorators included, so
    inline oracle SQL literals count) plus the top-level constant
    assignments the function (or its decorator f-strings) actually
    references by name (shared thresholds like ``_PMI_MIN_COUNT``),
  * ``deps`` — path -> hash of the SYMBOL CLOSURE the query actually
    uses in every open_tlm_spark module (operators/, store/,
    streaming/, sources/, functions/, and — since round 14 — the
    plans/ helper modules themselves): starting from function-local
    imports, module-level import aliases referenced in the body, and
    same-module top-level helpers, we chase the referenced top-level
    functions/classes/constants and, transitively, every module-level
    symbol THOSE reference (including cross-module imports). The hash
    covers only the used symbols' source segments, so APPENDING a new
    operator to a shared file does not stale its existing users —
    only editing a function on the query's actual call path does.
    Unresolvable dynamic imports fall back to whole-file hashing
    (safe over-approximation).

    The plans/ extension is VERDICT r13 "What's wrong" #1: query
    builders COMPOSE other query builders and the shared-subtree
    helpers (plans/shared_subtrees.py), so a round-13-style rewire of
    `sim_pq_adc_topk` restructures `sim_pq_recall_eval` without
    touching its own source. Following query-builder -> query-builder
    and query-builder -> shared-view calls makes that class of miss
    machine-caught. `plans.registry` (ledger plumbing) and the
    `plans` package __init__ (imports-only) stay excluded,
  * ``oracle_sha`` — sha256 of the registered DuckDB oracle string
    (``null`` in records seeded from rounds before this ledger
    existed, where the historical oracle text is not recoverable
    without executing old code; compared only when present),
  * ``round`` — the round number of the green row.

``tests/test_evidence_freshness.py`` then fails whenever a query's
current fingerprint/deps/oracle differ from its ledger record but the
query is NOT inside the first CHECK_WINDOW entries of the registry
head — i.e. any behavior-relevant edit forces the query back into the
driver's next correctness window, by construction.

Deliberately excluded dep modules: ``session``/``schemas``/``api``
(infrastructure imported by everything — an edit there would trip the
whole registry, which no 50-slot window can absorb; those modules are
pinned by the pytest suite and the TZ-matrix diffcheck instead) and
``plans.registry`` (the ledger's own plumbing).

CLI:
  python tools/evidence.py update --round N CORRECTNESS_rN.json
      refresh ledger records for every green query, from the CURRENT
      working tree (run right after a driver round lands).
  python tools/evidence.py seed
      rebuild the ledger from all CORRECTNESS_r0*.json files using
      the code as of each round's boundary commit (git show).
  python tools/evidence.py check
      print stale queries and whether each sits in the check window.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "open_tlm_spark", "plans", "evidence.json")

_EXCLUDE = {
    "open_tlm_spark.session",
    "open_tlm_spark.schemas",
    "open_tlm_spark.api",
    "open_tlm_spark.plans",  # package __init__: imports only
    "open_tlm_spark.plans.registry",
}


def _mod_path(mod: str) -> str | None:
    """Module name -> repo-relative file path (None if not ours)."""
    if not mod.startswith("open_tlm_spark"):
        return None
    p = mod.replace(".", "/") + ".py"
    if os.path.exists(os.path.join(REPO, p)):
        return p
    p = mod.replace(".", "/") + "/__init__.py"
    if os.path.exists(os.path.join(REPO, p)):
        return p
    return None


def _resolve_importfrom(node: ast.ImportFrom) -> set[tuple[str, str | None]]:
    """`from X import a, b` -> {(module, symbol)}; (X.a, None) when
    X/a.py is itself a module, else (X, a)."""
    out: set[tuple[str, str | None]] = set()
    base = node.module or ""
    if not base.startswith("open_tlm_spark"):
        return out
    for alias in node.names:
        sub = f"{base}.{alias.name}"
        out.add((sub, None) if _mod_path(sub) else (base, alias.name))
    return out


def _import_alias_table(tree: ast.Module) -> dict[str, tuple[str, str | None]]:
    """Top-level imports: bound name -> (module, symbol|None).
    symbol None means the name IS the module (attribute access gives
    the symbols)."""
    table: dict[str, tuple[str, str | None]] = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("open_tlm_spark"):
                    table[alias.asname or alias.name.split(".")[0]] = (
                        alias.name,
                        None,
                    )
        elif isinstance(node, ast.ImportFrom):
            base = node.module or ""
            if not base.startswith("open_tlm_spark"):
                continue
            for alias in node.names:
                sub = f"{base}.{alias.name}"
                table[alias.asname or alias.name] = (
                    (sub, None) if _mod_path(sub) else (base, alias.name)
                )
    return table


def _fn_node(tree: ast.Module, func_name: str) -> ast.FunctionDef | None:
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            return node
    return None


def _fn_segment(source: str, node: ast.FunctionDef) -> str:
    lines = source.splitlines()
    start = node.lineno
    if node.decorator_list:
        start = min(d.lineno for d in node.decorator_list)
    return "\n".join(lines[start - 1 : node.end_lineno])


def _used_names(node: ast.FunctionDef) -> set[str]:
    """Every Name referenced anywhere in the decorated function
    (decorators and their f-strings included — ast.walk covers
    decorator_list)."""
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def _referenced_constants(
    source: str, tree: ast.Module, used: set[str]
) -> str:
    """Source of top-level Assign/AnnAssign whose target the function
    references, in file order."""
    parts = []
    for node in tree.body:
        targets: list[str] = []
        if isinstance(node, ast.Assign):
            targets = [
                t.id for t in node.targets if isinstance(t, ast.Name)
            ]
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            targets = [node.target.id]
        if any(t in used for t in targets):
            seg = ast.get_source_segment(source, node)
            if seg:
                parts.append(seg)
    return "\n".join(parts)


def definition_fingerprint(source: str, func_name: str) -> str | None:
    tree = ast.parse(source)
    node = _fn_node(tree, func_name)
    if node is None:
        return None
    payload = (
        _fn_segment(source, node)
        + "\n#CONST#\n"
        + _referenced_constants(source, tree, _used_names(node))
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:20]


def _tracked(mod: str) -> bool:
    return mod.startswith("open_tlm_spark") and mod not in _EXCLUDE


def _node_refs(
    node: ast.AST,
    table: dict[str, tuple[str, str | None]],
    local_symbols: set[str],
    mod: str,
) -> set[tuple[str, str | None]]:
    """(module, symbol) references made inside `node`: local imports,
    names bound by module-level imports (with attribute chasing for
    module aliases), and same-module top-level symbols."""
    refs: set[tuple[str, str | None]] = set()
    used: set[str] = set()
    attrs: dict[str, set[str]] = {}
    # node-local imports shadow the module-level table for the
    # purpose of attribute chasing (e.g. `from ... import dedup as D`
    # inside a query body, then D.shingle_table(...))
    local_table = dict(table)
    for sub in ast.walk(node):
        if isinstance(sub, ast.Import):
            for a in sub.names:
                if a.name.startswith("open_tlm_spark"):
                    local_table[a.asname or a.name.split(".")[0]] = (
                        a.name,
                        None,
                    )
        elif isinstance(sub, ast.ImportFrom):
            base = sub.module or ""
            if base.startswith("open_tlm_spark"):
                for a in sub.names:
                    subm = f"{base}.{a.name}"
                    local_table[a.asname or a.name] = (
                        (subm, None) if _mod_path(subm) else (base, a.name)
                    )
        elif isinstance(sub, ast.Attribute) and isinstance(
            sub.value, ast.Name
        ):
            attrs.setdefault(sub.value.id, set()).add(sub.attr)
            used.add(sub.value.id)
        elif isinstance(sub, ast.Name):
            used.add(sub.id)
    for alias, (m, sym) in local_table.items():
        if alias not in used:
            continue
        if sym is not None:
            refs.add((m, sym))
        elif alias in attrs:
            refs |= {(m, a) for a in attrs[alias]}
        else:
            refs.add((m, None))  # bare module ref: whole module
    refs |= {(mod, s) for s in local_symbols & used}
    return refs


class _ModuleIndex:
    """Parsed view of one module for closure walking."""

    def __init__(self, source: str):
        self.source = source
        self.tree = ast.parse(source)
        self.table = _import_alias_table(self.tree)
        self.symbols: dict[str, ast.stmt] = {}
        self.import_bindings: dict[str, tuple[str, str | None]] = {}
        for node in self.tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                self.symbols[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.symbols[t.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                self.symbols[node.target.id] = node
        # re-exports: top-level `from X import y` binds y here
        for name, target in self.table.items():
            if name not in self.symbols:
                self.import_bindings[name] = target


def symbol_closure(
    start: set[tuple[str, str | None]], read
) -> dict[str, str]:
    """Expand (module, symbol) refs transitively; return
    {path: hash of the used symbols' source segments}. symbol None
    means the whole module file (fallback / bare module use)."""
    indexes: dict[str, _ModuleIndex | None] = {}
    segments: dict[str, set[tuple[int, str]]] = {}
    whole: set[str] = set()
    seen: set[tuple[str, str | None]] = set()
    frontier = list(start)

    def index_of(mod: str) -> _ModuleIndex | None:
        if mod not in indexes:
            path = _mod_path(mod)
            src = read(path) if path else None
            indexes[mod] = _ModuleIndex(src) if src is not None else None
        return indexes[mod]

    while frontier:
        mod, sym = frontier.pop()
        if (mod, sym) in seen or not _tracked(mod):
            continue
        seen.add((mod, sym))
        idx = index_of(mod)
        if idx is None:
            continue
        if sym is None:
            whole.add(mod)
            # follow the module's top-level imports too
            for node in idx.tree.body:
                if isinstance(node, ast.Import):
                    frontier += [
                        (a.name, None)
                        for a in node.names
                        if a.name.startswith("open_tlm_spark")
                    ]
                elif isinstance(node, ast.ImportFrom):
                    frontier += list(_resolve_importfrom(node))
            continue
        if sym in idx.import_bindings:
            frontier.append(idx.import_bindings[sym])
            continue
        node = idx.symbols.get(sym)
        if node is None:
            whole.add(mod)  # dynamic / unresolvable: over-approximate
            continue
        seg = ast.get_source_segment(idx.source, node)
        if seg is not None:
            segments.setdefault(mod, set()).add((node.lineno, seg))
        frontier += list(
            _node_refs(node, idx.table, set(idx.symbols), mod)
        )

    out: dict[str, str] = {}
    for mod in set(segments) | whole:
        path = _mod_path(mod)
        if path is None:
            continue
        if mod in whole:
            idx = index_of(mod)
            out[path] = _blob_sha(idx.source if idx else "")
            continue
        payload = "\n#SYM#\n".join(
            s for _, s in sorted(segments[mod])
        )
        out[path] = hashlib.sha256(payload.encode()).hexdigest()[:16]
    return out


def direct_deps(
    source: str, func_name: str, module: str = ""
) -> set[tuple[str, str | None]]:
    """(module, symbol) refs the query function makes: cross-module
    imports AND — when `module` is given — same-module top-level
    helpers (oracle builders, composed query builders), so plans-side
    composition is part of the closure (see module docstring)."""
    tree = ast.parse(source)
    node = _fn_node(tree, func_name)
    if node is None:
        return set()
    table = _import_alias_table(tree)
    local_symbols: set[str] = set()
    if module:
        idx = _ModuleIndex(source)
        # the query's own function is covered by its fingerprint;
        # module constants it references are too (definition_
        # fingerprint) but re-hashing them in deps is harmless.
        local_symbols = set(idx.symbols) - {func_name}
    return {
        (m, s)
        for m, s in _node_refs(node, table, local_symbols, module)
        if _tracked(m)
    }


def _blob_sha(source: str) -> str:
    """git blob sha of the text (matches `git hash-object`)."""
    data = source.encode()
    return hashlib.sha1(b"blob %d\0" % len(data) + data).hexdigest()[:16]


def _read_fs(path: str) -> str | None:
    full = os.path.join(REPO, path)
    if not os.path.exists(full):
        return None
    with open(full, encoding="utf-8") as f:
        return f.read()


def _read_git(commit: str):
    def read(path: str) -> str | None:
        r = subprocess.run(
            ["git", "show", f"{commit}:{path}"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        return r.stdout if r.returncode == 0 else None

    return read


def compute_record(
    module: str, func_name: str, oracle: str | None, read
) -> dict | None:
    path = _mod_path(module)
    if path is None:
        return None
    src = read(path)
    if src is None:
        return None
    fp = definition_fingerprint(src, func_name)
    if fp is None:
        return None
    # the defining module's behavior-relevant parts are in the
    # fingerprint; deps track the used-symbol closure in the operator
    # AND plans helper modules (incl. composed query builders)
    deps = symbol_closure(direct_deps(src, func_name, module), read)
    return {
        "module": module,
        "fingerprint": fp,
        "deps": dict(sorted(deps.items())),
        "oracle_sha": (
            hashlib.sha256(oracle.encode()).hexdigest()[:20]
            if oracle is not None
            else None
        ),
    }


def _registry():
    sys.path.insert(0, REPO)
    from open_tlm_spark.plans import REGISTRY  # populates on import

    return REGISTRY


def _green(row: dict) -> bool:
    # rows-only queries (oracle None by design) come back as
    # err='no_oracle' with spark_rows recorded — the driver's weaker
    # check; count a completed run as green for freshness purposes.
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return (
        row.get("err") is None
        and row.get("rows_match") is not False
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    )


def _load(path: str = LEDGER) -> dict:
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return {}


def _save(ledger: dict, path: str = LEDGER) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")


def cmd_update(round_no: int, corr_path: str, ledger_path: str = LEDGER) -> int:
    reg = _registry()
    with open(corr_path, encoding="utf-8") as f:
        corr = json.load(f)
    ledger = _load(ledger_path)
    n = 0
    for name, row in corr.items():
        if name not in reg or not _green(row):
            continue
        rec = compute_record(
            reg[name].module, reg[name].func_name, reg[name].oracle, _read_fs
        )
        if rec is None:
            continue
        ledger[name] = {"round": round_no, **rec}
        n += 1
    # prune queries that no longer exist
    for name in [n_ for n_ in ledger if n_ not in reg]:
        del ledger[name]
    _save(ledger, ledger_path)
    print(f"updated {n} records (round {round_no}) -> {ledger_path}")
    return 0


def cmd_seed() -> int:
    """Rebuild from all driver CORRECTNESS files at their boundary
    commits (the code each green row actually verified)."""
    reg = _registry()
    out = subprocess.run(
        ["git", "log", "--format=%H %s", "--all"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout
    boundaries: dict[int, str] = {}
    for line in out.splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            boundaries[int(m.group(2))] = m.group(1)
    ledger: dict = {}
    for rnd in sorted(boundaries):
        corr_path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(corr_path):
            continue
        read = _read_git(boundaries[rnd])
        with open(corr_path, encoding="utf-8") as f:
            corr = json.load(f)
        for name, row in corr.items():
            if name not in reg or not _green(row):
                continue
            rec = compute_record(
                reg[name].module, reg[name].func_name, None, read
            )
            if rec is None:  # not present at that commit under this name
                continue
            rec["oracle_sha"] = None  # historical oracle not recoverable
            ledger[name] = {"round": rnd, **rec}
    _save(ledger)
    print(f"seeded {len(ledger)} records from rounds {sorted(boundaries)}")
    return 0


def stale_queries() -> dict[str, str]:
    """Current staleness: name -> reason ('' if fresh)."""
    reg = _registry()
    ledger = _load()
    out: dict[str, str] = {}
    for name, q in reg.items():
        rec = ledger.get(name)
        if rec is None:
            out[name] = "no green driver row recorded"
            continue
        cur = compute_record(q.module, q.func_name, q.oracle, _read_fs)
        if cur is None:
            out[name] = "definition not found"
        elif cur["fingerprint"] != rec["fingerprint"]:
            out[name] = f"definition changed since round {rec['round']}"
        elif cur["deps"] != rec["deps"]:
            changed = sorted(
                set(cur["deps"].items()) ^ set(rec["deps"].items())
            )
            out[name] = (
                f"deps changed since round {rec['round']}: "
                + ", ".join(sorted({p for p, _ in changed}))
            )
        elif (
            rec.get("oracle_sha") is not None
            and cur["oracle_sha"] != rec["oracle_sha"]
        ):
            out[name] = f"oracle changed since round {rec['round']}"
    return out


def cmd_check() -> int:
    _registry()  # ensures REPO on sys.path and plans imported
    from open_tlm_spark.plans.registry import CHECK_WINDOW, spark_queries

    window = set(list(spark_queries())[:CHECK_WINDOW])
    stale = stale_queries()
    bad = 0
    for name, reason in sorted(stale.items()):
        ok = name in window
        print(f"{'in-window ' if ok else 'UNCOVERED '} {name}: {reason}")
        bad += 0 if ok else 1
    print(f"{len(stale)} stale, {bad} outside the {CHECK_WINDOW}-slot window")
    return 1 if bad else 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "seed":
        return cmd_seed()
    if len(sys.argv) >= 2 and sys.argv[1] == "check":
        return cmd_check()
    if (
        len(sys.argv) == 5
        and sys.argv[1] == "update"
        and sys.argv[2] == "--round"
    ):
        return cmd_update(int(sys.argv[3]), sys.argv[4])
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
