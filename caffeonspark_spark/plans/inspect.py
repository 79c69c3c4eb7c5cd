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
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each file scan reads (one set per scan)."""
    plan = physical_plan(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        scans.append(cols)
    return scans


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the plan (counted on the
    formatted-plan detail headers so tree+detail don't double-count)."""
    return len(re.findall(r"\(\d+\) Exchange", physical_plan(df)))


def wholestage_codegen_ops(df: DataFrame) -> int:
    """Count of WholeStageCodegen spans — wider is better for the hot path."""
    return len(re.findall(r"WholeStageCodegen", physical_plan(df)))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan contains a map-side partial hash aggregate."""
    plan = physical_plan(df)
    return "HashAggregate" in plan and plan.count("HashAggregate") >= 2
