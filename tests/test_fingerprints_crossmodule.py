"""Pins for the cross-module fingerprint closure (harness-review fixes):
helper-body edits in ANOTHER module re-front their dependents, docstring/
comment-only edits re-front nothing, and the fallback is content-sensitive."""

from __future__ import annotations

import sys
import types


def _mk_module(name: str, src: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    fake_file = f"<{name}>"
    mod.__file__ = fake_file  # inspect.getfile needs it
    exec(compile(src, fake_file, "exec"), mod.__dict__)
    # inspect.getsource resolves lines through linecache by __file__
    import linecache

    linecache.cache[fake_file] = (
        len(src),
        None,
        src.splitlines(keepends=True),
        fake_file,
    )
    sys.modules[name] = mod
    return mod


HELPER = "caffeonspark_spark._fp_test_helper"
QMOD = "caffeonspark_spark._fp_test_queries"


def _setup(helper_body: str, query_doc: str = "") -> dict:
    _mk_module(HELPER, f"def shared_sum(x):\n    return {helper_body}\n")
    doc = f'    """{query_doc}"""\n' if query_doc else ""
    _mk_module(
        QMOD,
        "from caffeonspark_spark._fp_test_helper import shared_sum\n\n"
        "def query_x(spark, sf):\n"
        f"{doc}"
        "    return shared_sum(1)\n\n"
        "def query_y(spark, sf):\n"
        "    return 42\n",
    )
    from tools_fingerprints import query_fingerprints

    mod = sys.modules[QMOD]
    return query_fingerprints({"qx": mod.query_x, "qy": mod.query_y}, {})


def _teardown():
    sys.modules.pop(HELPER, None)
    sys.modules.pop(QMOD, None)


def test_cross_module_helper_body_edit_refronts_dependent():
    """Editing a helper's BODY in another module must change the
    fingerprint of queries importing it (the dsum blindspot: the r7
    same-module closure saw only the unchanged import line)."""
    try:
        fps1 = _setup("x + 1")
        fps2 = _setup("x + 2")
        assert fps1["qx"] != fps2["qx"], "helper body edit invisible"
        assert fps1["qy"] == fps2["qy"], "unrelated query re-fronted"
    finally:
        _teardown()


def test_docstring_only_edit_does_not_refront():
    """Fingerprints hash executable content: a docstring/comment-only edit
    anywhere in the closure must NOT re-front (a catalog.py docstring fix
    would otherwise re-front every query through load_table)."""
    try:
        fps1 = _setup("x + 1", query_doc="old words")
        fps2 = _setup("x + 1", query_doc="entirely new words")
        assert fps1["qx"] == fps2["qx"]
    finally:
        _teardown()


def test_fallback_is_content_sensitive():
    """A query callable whose name can't be resolved to a module segment
    (lambda) falls back to hashing the whole module source — edits still
    re-front it (the old constant fallback retired lambdas forever)."""
    try:
        m1 = _mk_module(QMOD, "q = lambda spark, sf: 1\n")
        from tools_fingerprints import query_fingerprints

        fps1 = query_fingerprints({"q": m1.q}, {})
        m2 = _mk_module(QMOD, "q = lambda spark, sf: 2\n")
        fps2 = query_fingerprints({"q": m2.q}, {})
        assert fps1["q"] != fps2["q"]
    finally:
        _teardown()


def test_live_dsum_reaches_streaming_parity_closure():
    """The concrete scenario from the review: dsum's BODY (functions/
    arrays.py) must be inside stream_tumbling_parity's closure — it is the
    decimal-grid sum the whole determinism doctrine rides on."""
    from tools_fingerprints import closure_sources

    triples = closure_sources(
        "caffeonspark_spark.streaming.windows", "stream_tumbling_parity"
    )
    assert any(
        m == "caffeonspark_spark.functions.arrays" and n == "dsum"
        for m, n, _ in triples
    )
