"""Registry lint: SUM over irrational doubles feeding a fine FLOOR.

Spark's partial-aggregation merge order is task-completion-dependent,
so ``SUM`` over doubles derived from POWER/SQRT/LN/EXP can drift one
ulp between runs; if that sum then feeds ``FLOOR(x * 1e5+)`` the output
flips nondeterministically (q554 flaked exactly this way in a contended
sweep; q507 was the same class). The deterministic form folds a SORTED
collected list — DuckDB ``LIST_REDUCE(LIST_SORT(LIST(...)))``, Spark
``AGGREGATE(SORT_ARRAY(COLLECT_LIST(...)), 0D, ...)`` — or
pre-quantizes to integers (q629's micro-log-probs).

Any query matching the hazard must either use one of those forms or be
whitelisted here with a reason.

    python tools/lint_float_sum_floor.py   # prints violations, exit 1
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shredder_spark import queries as Q

# queries that match the textual pattern but are order-safe, with why
WHITELIST = {
    # integer-exact sums feed the FLOOR; the SQRT/POWER terms are
    # per-row scalar expressions, not aggregated
    "q531_rec_list_metrics": "FLOOR inputs are integer counts",
    "q683_reciprocal_rank_fusion":
        "rrf is a fixed two-operand sum; bm25/cosine sums are "
        "integer-valued doubles (exact)",
    # pre-quantized to integer micros BEFORE the SUM
    "q629_naive_bayes_langid": "SUM over BIGINT lp_micro",
}

IRR = r"(POWER|SQRT|LN|EXP|LOG)\s*\("
FINE_FLOOR = r"FLOOR\s*\([^;]*\*\s*10{5,}"
SORTED_FOLD = r"(LIST_SORT|SORT_ARRAY)"


def texts(q):
    for t in (q.oracle, q.engine_sql):
        if t:
            yield t


def main() -> int:
    bad = []
    for name, q in sorted(Q.registry().items()):
        if name in WHITELIST:
            continue
        for t in texts(q):
            if not re.search(FINE_FLOOR, t, re.I):
                continue
            # a SUM whose argument expression contains an irrational fn
            for m in re.finditer(r"SUM\s*\(", t, re.I):
                # crude paren-matched argument slice
                depth, i = 1, m.end()
                while i < len(t) and depth:
                    depth += t[i] == "("
                    depth -= t[i] == ")"
                    i += 1
                arg = t[m.end():i - 1]
                if re.search(IRR, arg, re.I):
                    if not re.search(SORTED_FOLD, t, re.I):
                        bad.append((name, arg.strip()[:60]))
                    break
            else:
                continue
            break
    for name, arg in bad:
        print(f"VIOLATION {name}: SUM({arg}...) feeds a fine FLOOR "
              f"without a sorted fold")
    print(f"checked {len(Q.registry())} queries, "
          f"{len(bad)} violations, {len(WHITELIST)} whitelisted")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
