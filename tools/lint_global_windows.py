#!/usr/bin/env python
"""Registry lint: no unpartitioned ORDER BY window over raw base rows.

``OVER (ORDER BY ...)`` with no PARTITION BY plans as ``Exchange
SinglePartition`` + a one-task sort of its whole input — fine when the
input is a bounded aggregate (days, months, per-cents counts, vocab
tops), a 100 TB non-starter when the input is raw fact/dimension rows.
Round 3 and round 4 each re-introduced the raw-row shape; this lint
makes the pattern a test failure so it cannot recur.

What it checks, for every registry query's ENGINE-side SQL text (the
text the engine actually runs: ``engine_sql``, else the shared
``oracle`` text; builder-backed queries run Python, not the text, and
their plans are asserted directly in tests/test_scale_windows.py):

1. split the text into CTE blocks + the final SELECT (balanced-paren
   parse, comments stripped);
2. find unpartitioned ordered window specs in each block — both inline
   ``OVER (ORDER BY ...)`` and named ``WINDOW w AS (ORDER BY ...)``;
3. classify each block's input as BOUNDED (it, or every relation it
   reads, passes through GROUP BY / SELECT DISTINCT / LIMIT — i.e. the
   window ranges over an aggregate whose size is set by a domain, not
   the row count) or RAW (reaches a base table with no aggregation);
4. an unpartitioned ordered window in a RAW block is a violation.

A window in a block that itself has a GROUP BY is fine: SQL evaluates
window functions after grouping, so it ranges over the aggregate.

ALLOWED lists the declared texts that intentionally keep the global
window as the oracle-parity surface — each has an equivalence-tested,
plan-asserted scale tier in operators/scale_windows.py.

Run: ``python tools/lint_global_windows.py`` (exits 1 on violations,
prints a census of all unpartitioned-ordered-window texts for
SCALE.md). Wired into tests/test_plans.py so CI trips on regressions.
"""

from __future__ import annotations

import re
import sys

BASE_TABLES = {
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
}

# Declared texts that keep the global window on purpose (oracle-parity
# surface); their scale tiers live in operators/scale_windows.py and
# are pinned in tests/test_scale_windows.py::SCALE_TIERS.
ALLOWED = {
    "q149_decile_stats",
    "q243_token_budget_prefix",
    "q288_rfm_quintiles",
    "q313_quantile_normalization",
    "q343_cumulative_gains",
}


def _strip_comments(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def _balanced(text: str, start: int) -> int:
    """Index just past the ')' matching the '(' at ``start``."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(text)


def _split_blocks(sql: str) -> dict:
    """{cte_name: body} + {'__final__': final select}. Handles the
    repo's ``WITH a AS (...), b AS (...) SELECT ...`` style, including
    nested parens inside CTE bodies."""
    blocks: dict[str, str] = {}
    m = re.match(r"\s*WITH\b", sql, re.I)
    pos = m.end() if m else 0
    if m:
        while True:
            mm = re.match(r"\s*,?\s*([A-Za-z_]\w*)\s+AS\s*\(", sql[pos:],
                          re.I)
            if not mm:
                break
            name = mm.group(1).lower()
            open_paren = pos + mm.end() - 1
            close = _balanced(sql, open_paren)
            blocks[name] = sql[open_paren + 1:close - 1]
            pos = close
    blocks["__final__"] = sql[pos:]
    return blocks


_WINDOW_DECL = re.compile(r"\bWINDOW\s+\w+\s+AS\s*\(", re.I)
_OVER = re.compile(r"\bOVER\s*\(", re.I)


def _unpartitioned_ordered_specs(body: str) -> list[str]:
    """Window specs in ``body`` that ORDER BY without PARTITION BY —
    inline OVER (...) and named WINDOW w AS (...) declarations."""
    specs = []
    for rx in (_OVER, _WINDOW_DECL):
        for m in rx.finditer(body):
            open_paren = m.end() - 1
            spec = body[open_paren + 1:_balanced(body, open_paren) - 1]
            if (re.search(r"\bORDER\s+BY\b", spec, re.I)
                    and not re.search(r"\bPARTITION\s+BY\b", spec, re.I)):
                specs.append(" ".join(spec.split()))
    return specs


_SOURCE = re.compile(r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)", re.I)
_AGGREGATED = re.compile(
    r"\bGROUP\s+BY\b|\bSELECT\s+DISTINCT\b|\bLIMIT\s+\d", re.I)
# A literal range/equality predicate on a key column bounds the block
# by a CONSTANT (e.g. ``WHERE doc_id < 100``): the relation stays that
# size at any corpus scale, so windows over it are scale-safe.
_BOUNDED_FILTER = re.compile(
    r"\bWHERE\b[^()]*?\b\w*(?:_id|key)\b\s*(?:<|<=|=)\s*\d", re.I)
_GLOBAL_AGG = re.compile(
    r"^\s*SELECT\s+(?!.*\bOVER\b).*\b(?:COUNT|SUM|MIN|MAX|AVG|STDDEV\w*|"
    r"VAR\w*|PERCENTILE\w*|CORR|COVAR\w*)\s*\(", re.I | re.S)


def _bounded(name: str, blocks: dict, memo: dict) -> bool:
    """A relation is bounded if every path from it to a base table
    passes through an aggregation/limit. Base tables are unbounded;
    unknown names (VALUES aliases, lateral-view aliases) are bounded."""
    if name in memo:
        return memo[name]
    if name in BASE_TABLES:
        return False
    body = blocks.get(name)
    if body is None:
        return True
    memo[name] = True  # cycle guard (self-references are bounded-ish)
    if (_AGGREGATED.search(body) or _GLOBAL_AGG.match(body.strip())
            or _BOUNDED_FILTER.search(body)):
        memo[name] = True
        return True
    srcs = {s.lower() for s in _SOURCE.findall(body)}
    memo[name] = all(_bounded(s, blocks, memo) for s in srcs)
    return memo[name]


def _block_is_raw(name: str, body: str, blocks: dict) -> bool:
    """True if this block's window input reaches a base table without
    aggregation. A GROUP BY in the SAME block bounds its own windows
    (SQL runs window functions after grouping)."""
    if _AGGREGATED.search(body) or _BOUNDED_FILTER.search(body):
        return False
    memo: dict = {}
    srcs = {s.lower() for s in _SOURCE.findall(body)}
    return any(not _bounded(s, blocks, memo) for s in srcs)


def lint_text(sql: str) -> tuple[list[tuple[str, str]], int]:
    """Returns ([(block, spec), ...] violations, n_global_specs)."""
    sql = _strip_comments(sql)
    blocks = _split_blocks(sql)
    violations = []
    n_specs = 0
    for name, body in blocks.items():
        specs = _unpartitioned_ordered_specs(body)
        n_specs += len(specs)
        if specs and _block_is_raw(name, body, blocks):
            for spec in specs:
                violations.append((name, spec))
    return violations, n_specs


def main() -> int:
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from shredder_spark import queries as q

    reg = q.registry()
    flagged: dict[str, list] = {}
    census_global, census_raw = [], []
    for name, query in sorted(reg.items()):
        if query.builder is not None:
            continue  # plan asserted directly, text not executed
        text = query.engine_sql if query.engine_sql is not None \
            else query.oracle
        if not text:
            continue
        violations, n_specs = lint_text(text)
        if n_specs:
            census_global.append(name)
        if violations:
            census_raw.append(name)
            if name not in ALLOWED:
                flagged[name] = violations

    print(f"engine texts with unpartitioned ORDER BY windows: "
          f"{len(census_global)}")
    print(f"  over raw base rows (tiered, allowed): "
          f"{sorted(set(census_raw) & ALLOWED)}")
    print(f"  over raw base rows (VIOLATIONS): {sorted(flagged)}")
    for name, violations in sorted(flagged.items()):
        for block, spec in violations:
            print(f"  {name} [{block}]: OVER ({spec})")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
