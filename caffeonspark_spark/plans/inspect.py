"""Physical-plan inspection helpers — the engine's ".explain discipline".

The 100 TB design contract is enforceable only if it's checkable: these
helpers parse ``explain("formatted")`` output so tests can assert that

* filters actually reached the parquet scan (``PushedFilters``),
* scans read only the projected columns (``ReadSchema``),
* dim joins went broadcast (no shuffle on the fact side),
* the hot path stays inside whole-stage codegen.

They're also the developer loop: ``print(physical_plan(df))`` while shaping
an operator, then pin the property in a test so a refactor can't silently
regress the plan (SURVEY.md §4: the reference hand-tuned these physical
properties; we assert Catalyst keeps choosing them).

Parsing notes (each bit below exists because the naive regex was verified
wrong on live Spark 4.1.2 output):

* ``PushedFilters``/``ReadSchema`` bodies contain NESTED brackets —
  ``In(id, [1,2,3])``, ``struct<emb:array<float>,label:int>`` — so both
  are extracted with balance-aware scanning and split only on TOP-LEVEL
  commas; a first-``]``/first-``>`` regex silently truncated everything
  after the first complex entry.
* formatted explain never prints the string "WholeStageCodegen"; codegen
  membership appears as ``[codegen id : N]`` per operator node.
* formatted explain prints each operator twice (tree line + detail
  header), so bare substring counts double-count; node counts match the
  ``(N) OpName`` detail headers only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _balanced_body(text: str, start: int, open_ch: str, close_ch: str) -> str:
    """Text between ``text[start] == open_ch`` and its matching close."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]  # unterminated: best effort


def _split_top_level(body: str, brackets: str = "([<") -> list[str]:
    """Split on commas not nested inside any bracket pair."""
    closers = {"(": ")", "[": "]", "<": ">"}
    close_set = {closers[b] for b in brackets}
    open_set = set(brackets)
    out, depth, cur = [], 0, []
    for ch in body:
        if ch in open_set:
            depth += 1
        elif ch in close_set:
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans, each entry
    intact (balance-aware: ``In(id, [1,2,3])`` is ONE entry, and entries
    after it are kept — the first-``]`` regex dropped both properties)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: ", plan):
        start = m.end()
        if start < len(plan) and plan[start] == "[":
            body = _balanced_body(plan, start, "[", "]").strip()
            if body:
                out.extend(_split_top_level(body, brackets="(["))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each file scan reads (one set per scan). Balance-aware
    over nested ``struct<``/``array<`` so columns AFTER a complex-typed
    column are not dropped and inner field names are not mistaken for
    top-level columns."""
    plan = physical_plan(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct", plan):
        start = m.end()
        if start < len(plan) and plan[start] == "<":
            body = _balanced_body(plan, start, "<", ">")
            cols = {
                c.split(":", 1)[0].strip()
                for c in _split_top_level(body, brackets="<")
            }
            scans.append({c for c in cols if c})
    return scans


def has_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the plan (counted on the
    formatted-plan detail headers so tree+detail don't double-count)."""
    return len(re.findall(r"\(\d+\) Exchange", physical_plan(df)))


def wholestage_codegen_ops(df: DataFrame) -> int:
    """Number of DISTINCT whole-stage-codegen spans — wider/fewer spans is
    better for the hot path. Formatted explain marks member operators with
    ``[codegen id : N]`` (it never prints "WholeStageCodegen", which an
    earlier version counted — always 0). Under AQE codegen annotations
    exist only in the FINAL adaptive plan: call an action on this exact
    DataFrame first (``df.collect()``), otherwise the pre-execution plan
    legitimately reports 0 spans."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", physical_plan(df))))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan contains a map-side partial hash aggregate: at
    least two HashAggregate NODES (partial + final). Counted on the
    ``(N) HashAggregate`` detail headers — formatted explain prints every
    operator twice, so a bare substring count of 2 is matched by a single
    aggregate node and detects nothing."""
    return len(re.findall(r"\(\d+\) HashAggregate", physical_plan(df))) >= 2
