"""Physical-plan linting: the scale anti-pattern gate.

PLANS.md documents what each query's plan IS; this module asserts what
no plan may BECOME. A refactor that silently turns a broadcast-hash
join into a cartesian product, or an expression into a row-at-a-time
Python UDF, passes every correctness test — the results are identical
— and only shows up as a 100× cliff at cluster scale. Linting the
executed-plan string catches the regression at test time, before any
data moves.

Rules (each returns a finding string):

- ``CartesianProduct`` — never acceptable.
- ``BatchEvalPython`` — row-at-a-time Python UDF in the plan; the
  engine's contract is Arrow-batched Python only (``ArrowEvalPython``
  / ``MapInPandas`` / ``FlatMapGroupsInPandas`` are fine).
- ``BroadcastNestedLoopJoin`` — flagged unless the caller allows it:
  the ONE legitimate shape is a 1-row broadcast (scalar subquery /
  query-vector cross join), which is O(n); anything else is O(n·m).
- parquet scans reading every column of a wide table when the query
  uses few — approximated by flagging scans whose ReadSchema lists
  more than ``max_scan_cols`` columns (tune per call; the testdata
  tables are narrow, so default is permissive).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

ARROW_OK = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "MapInArrow")


def lint_plan(
    df: DataFrame, *, allow_bnlj: bool = False, max_scan_cols: int | None = None
) -> list[str]:
    """Findings for scale anti-patterns in ``df``'s physical plan
    (plan compilation only — nothing executes). Empty list = clean."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append("CartesianProduct: unbounded n*m join")
    if "BatchEvalPython" in plan:
        findings.append(
            "BatchEvalPython: row-at-a-time Python UDF (use Arrow-batched forms)"
        )
    if not allow_bnlj and "BroadcastNestedLoopJoin" in plan:
        findings.append(
            "BroadcastNestedLoopJoin: O(n*m) unless the broadcast side is "
            "a scalar (pass allow_bnlj=True only for 1-row broadcasts)"
        )
    if max_scan_cols is not None:
        for ncols in _read_schema_widths(plan):
            if ncols > max_scan_cols:
                findings.append(
                    f"wide scan: {ncols} columns read (> {max_scan_cols}) — "
                    "projection not pushed to the source"
                )
    return findings


#: Operators counted by ``plan_fingerprint`` — the shuffle/join-
#: strategy shape of a plan. Exchange is every shuffle boundary;
#: the join kinds distinguish broadcast (cheap) from shuffled
#: (SMJ/SHJ) from nested-loop (only ever the audited scalar shape).
FINGERPRINT_OPS = {
    # shuffle exchanges ONLY: the bare substring "Exchange" also hits
    # BroadcastExchange (not a shuffle) and ReusedExchange (no new
    # shuffle), which would let Spark inserting/removing a reuse node
    # churn the pin with no real shape change
    "exchange": r"(?<!Broadcast)(?<!Reused)Exchange",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
}


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    """Shuffle/join-shape counts of ``df``'s physical plan (compile
    only, nothing executes; zero counts are omitted). The lint gate
    catches categorical anti-patterns — this catches GRADUAL shape
    drift: a refactor that adds an avoidable Exchange or degrades a
    broadcast join to sort-merge passes every correctness test and
    only shows up as bench slowdown; pinning the counts turns it into
    a test diff instead."""
    counts = dict.fromkeys(FINGERPRINT_OPS, 0)
    _walk_plan(df._jdf.queryExecution().executedPlan(), counts)
    return {k: v for k, v in counts.items() if v}


#: physical-node class → fingerprint key. BroadcastExchangeExec and
#: ReusedExchangeExec are deliberately absent (not shuffles / no new
#: shuffle), matching the string-regex exclusions this walk replaced.
_NODE_KINDS = {
    "ShuffleExchangeExec": "exchange",
    "BroadcastHashJoinExec": "bhj",
    "SortMergeJoinExec": "smj",
    "ShuffledHashJoinExec": "shj",
    "BroadcastNestedLoopJoinExec": "bnlj",
}


def _walk_plan(node, counts) -> None:
    """Count fingerprint nodes by walking the plan TREE (round 11;
    was a regex over the plan STRING). The string form double-counts
    persisted frames: an ``InMemoryRelation`` PRINTS the plan that
    originally built the cached rows, so every ``InMemoryTableScan``
    consumer re-counted the build plan's exchanges — in the tree the
    relation is a leaf, exactly matching what executes. Subquery
    plans (scalar/IN) hang off expressions, not children, and are
    walked explicitly; an un-executed AQE node exposes the plan it
    will start from via ``initialPlan``."""
    cls = node.getClass().getSimpleName()
    kind = _NODE_KINDS.get(cls)
    if kind:
        counts[kind] += 1
    if cls == "AdaptiveSparkPlanExec":
        _walk_plan(node.initialPlan(), counts)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk_plan(ch.apply(i), counts)
    sq = node.subqueries()
    for i in range(sq.size()):
        _walk_plan(sq.apply(i), counts)


def _read_schema_widths(plan: str) -> list[int]:
    """Top-level column count of every ``ReadSchema: struct<…>`` in the
    plan string. Brackets are matched by depth — a non-greedy regex
    stops at the FIRST ``>`` of a nested struct/array/map type and
    undercounts, letting wide scans of nested tables through
    (ADVICE r06)."""
    widths: list[int] = []
    for m in re.finditer(r"ReadSchema: struct<", plan):
        start = m.end()
        depth, i = 1, start
        while i < len(plan) and depth:
            if plan[i] == "<":
                depth += 1
            elif plan[i] == ">":
                depth -= 1
            i += 1
        body = plan[start : i - 1]
        # parens count toward depth too: decimal(12,2)'s comma is a
        # type parameter, not a column separator
        depth, ncols = 0, 1 if body.strip() else 0
        for ch in body:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            elif ch == "," and depth == 0:
                ncols += 1
        widths.append(ncols)
    return widths
