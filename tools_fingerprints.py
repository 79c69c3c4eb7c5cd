"""Per-query content fingerprints — the retire-from-rotation baseline.

A query's fingerprint is sha256 over the source of its function PLUS every
helper it transitively references — same-module helpers by bare name, and
(new in this revision) CROSS-MODULE helpers reached through
``from pkg.mod import helper`` bindings, both module-level and local
(function-body) imports — plus its oracle SQL. The closure crosses module
boundaries only inside this repo's own package (``caffeonspark_spark``):
stdlib/pyspark imports contribute their import LINE (so re-pointing an
import still re-fronts) but not their bodies.

Why cross-module: the previous same-module closure was blind to helper
BODY edits in another module — editing ``dsum`` in ``functions/arrays.py``
changed no referencing module's source, so the ~50 queries whose
determinism rides on it stayed retired with zero external re-verification.

Fallback honesty: when a query callable's source can't be resolved into
segments (lambda, partial, nested def, source unavailable), the fingerprint
falls back to the WHOLE defining module's source — coarse (any module edit
re-fronts the query) but content-sensitive; the previous ``module:qualname``
constant fallback retired such queries permanently after one green row.

Shared by ``__spark_entry__`` (rotation) and ``tools_sync_fingerprints``
(round-start baseline sync), and imported by the QUERY_FPS migration that
recomputes baselines at a historical commit.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import sys
import textwrap

_PKG = "caffeonspark_spark"


def _bind_target(t, txt: str, seg: dict[str, str]) -> None:
    if isinstance(t, ast.Name):
        seg[t.id] = txt
    elif isinstance(t, (ast.Tuple, ast.List)):
        for el in t.elts:
            _bind_target(el, txt, seg)


def _resolve_from_import(node: ast.ImportFrom, mod_name: str) -> str:
    """Absolute module path of a (possibly relative) ``from X import ...``."""
    module = node.module or ""
    if node.level:
        base = mod_name.rsplit(".", node.level)[0]
        module = f"{base}.{module}" if module else base
    return module


def module_segments(mod_name: str) -> tuple[dict[str, str], dict[str, tuple[str, str]]]:
    """(segments, imports) of a module: source segment per top-level name
    (def/class/assign/import — tuple targets included), plus, for names
    bound by ``from <in-package module> import x [as y]``, the edge
    ``bound_name -> (target_module, original_name)`` the cross-module
    closure follows. Import lines never shadow a real definition's
    segment."""
    src = inspect.getsource(sys.modules[mod_name])
    seg: dict[str, str] = {}
    imports: dict[str, tuple[str, str]] = {}
    for node in ast.parse(src).body:
        txt = ast.get_source_segment(src, node) or ""
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            seg[node.name] = txt
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                _bind_target(t, txt, seg)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            seg[node.target.id] = txt
        elif isinstance(node, ast.ImportFrom):
            module = _resolve_from_import(node, mod_name)
            for alias in node.names:
                bound = alias.asname or alias.name
                seg.setdefault(bound, txt)
                if module.startswith(_PKG):
                    imports[bound] = (module, alias.name)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                bound = alias.asname or alias.name.split(".")[0]
                seg.setdefault(bound, txt)
    return seg, imports


def _parse_segment(src: str) -> ast.AST:
    try:
        return ast.parse(src)
    except SyntaxError:  # indented segment
        return ast.parse(textwrap.dedent(src))


def _strip_docstrings(node: ast.AST) -> None:
    """Drop leading string-constant statements (docstrings) from every
    body in the tree, in place."""
    for n in ast.walk(node):
        body = getattr(n, "body", None)
        if (
            isinstance(body, list)
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
            and isinstance(
                n, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            )
        ):
            n.body = body[1:] or [ast.Pass()]


def normalize_segment(src: str) -> str:
    """Executable-content normal form of a source segment: parse, strip
    docstrings, unparse (drops comments and formatting). Fingerprints hash
    THIS, so a docstring/comment/formatting-only edit does not re-front
    every query whose closure contains the touched helper — only changes
    to code that can alter results do. Falls back to the raw text when the
    segment doesn't parse."""
    try:
        tree = _parse_segment(src)
        _strip_docstrings(tree)
        return ast.unparse(tree)
    except Exception:
        return src


def closure_names(seg: dict[str, str], root: str) -> list[str]:
    """SAME-MODULE transitive closure from ``root`` by bare-name reference
    (the r7 behavior, kept for tests and as the intra-module step of the
    cross-module walk). Sorted for a deterministic payload."""
    todo, done = [root], set()
    while todo:
        cur = todo.pop()
        if cur in done or cur not in seg:
            continue
        done.add(cur)
        for node in ast.walk(_parse_segment(seg[cur])):
            if isinstance(node, ast.Name) and node.id in seg and node.id not in done:
                todo.append(node.id)
    return sorted(done)


def _segments_cached(mod_name: str, cache: dict) -> tuple[dict, dict]:
    if mod_name not in cache:
        if mod_name not in sys.modules:
            import importlib

            importlib.import_module(mod_name)
        cache[mod_name] = module_segments(mod_name)
    return cache[mod_name]


def closure_sources(
    mod_name: str, root: str, cache: dict | None = None
) -> list[tuple[str, str, str]]:
    """Cross-module transitive closure: ``(module, name, source)`` triples
    reachable from ``(mod_name, root)`` via bare-name references,
    module-level from-import bindings, and from-imports that appear INSIDE
    a followed segment (operators import shared helpers like ``dsum``
    locally). Only in-package modules are entered. Sorted by (module,
    name) for a deterministic payload."""
    cache = cache if cache is not None else {}
    todo: list[tuple[str, str]] = [(mod_name, root)]
    done: set[tuple[str, str]] = set()
    out: list[tuple[str, str, str]] = []
    while todo:
        mod, name = todo.pop()
        if (mod, name) in done:
            continue
        done.add((mod, name))
        try:
            seg, imports = _segments_cached(mod, cache)
        except Exception:
            continue
        if name not in seg:
            continue
        out.append((mod, name, seg[name]))
        if name in imports:
            todo.append(imports[name])
        tree = _parse_segment(seg[name])
        for node in ast.walk(tree):
            if isinstance(node, ast.Name) and node.id in seg:
                todo.append((mod, node.id))
            elif isinstance(node, ast.ImportFrom):
                module = _resolve_from_import(node, mod)
                if module.startswith(_PKG):
                    for alias in node.names:
                        todo.append((module, alias.name))
    return sorted(out)


def query_fingerprints(base: dict, oracles: dict[str, str]) -> dict[str, str]:
    """Content fingerprint per query (see module docstring for the closure
    definition). ``base`` maps query name -> callable; ``oracles`` maps
    query name -> oracle SQL (missing = rows-only query)."""
    cache: dict = {}
    fps: dict[str, str] = {}
    for name, fn in base.items():
        mod = getattr(fn, "__module__", None)
        fn_name = getattr(fn, "__name__", None)
        body = None
        try:
            triples = closure_sources(mod, fn_name, cache)
            if triples:
                body = "\n".join(
                    f"## {m}:{n}\n{normalize_segment(src)}"
                    for m, n, src in triples
                )
        except Exception:
            body = None
        if body is None:
            # content-sensitive fallback: whole defining module's source
            # (a constant fallback retired lambdas/partials forever after
            # their first green row)
            try:
                body = (
                    f"{mod}:{getattr(fn, '__qualname__', fn_name)}\n"
                    + normalize_segment(inspect.getsource(sys.modules[mod]))
                )
            except Exception:
                body = f"{mod}:{getattr(fn, '__qualname__', fn_name)}"
        payload = body + "\n---oracle---\n" + oracles.get(name, "")
        fps[name] = hashlib.sha256(payload.encode()).hexdigest()[:16]
    return fps
