#!/usr/bin/env python
"""Round-13 CTE re-expansion detector (the q249 disease, generalized).

Spark expands every CTE reference into its own subtree; per-branch
inferred filters (InferFiltersFromConstraints) then usually keep the
duplicated exchanges from canonicalizing equal, so neither
ReuseExchange nor the AQE stage cache unifies them and the base table
is scanned once PER REFERENCE.

Pass 1 (static, no Spark): engine SQL texts where some CTE name is
referenced >= 2 times after its definition and the text reads a fact
table (lineitem / orders / documents / events / embeddings).

Pass 2 (one Spark session, sf0.01): for each candidate, run the query
and count FileScan occurrences of fact tables in the FINAL (post-AQE)
plan vs the number of distinct fact tables used. final_scans >
distinct tables means live duplicated scans survived runtime reuse.

Usage: python tools/cte_reexpansion_scan.py [out.json] [--static-only]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = ("lineitem", "orders", "documents", "events", "embeddings")


def static_candidates():
    from shredder_spark import queries as qm
    reg = qm.registry()
    out = {}
    for name, q in reg.items():
        # engine text resolution mirrors Query.run: engine_sql if set,
        # else the shared oracle text (builder queries have no text)
        sql = q.engine_sql if q.engine_sql is not None else q.oracle
        if not sql or q.builder is not None:
            continue
        low = sql.lower()
        facts = [t for t in FACTS if re.search(rf"\bfrom\s+{t}\b", low)
                 or re.search(rf"\bjoin\s+{t}\b", low)]
        if not facts:
            continue
        # CTE definitions: "name AS (" at a clause boundary
        defs = re.findall(r"(?:with|,)\s*([a-z_][a-z0-9_]*)\s+as\s*\(", low)
        multi = {}
        for cte in set(defs):
            # references: uses of the name NOT followed by "as (", after
            # its definition; count FROM/JOIN uses
            uses = len(re.findall(
                rf"(?:from|join)\s+{cte}\b(?!\s+as\s*\()", low))
            if uses >= 2:
                multi[cte] = uses
        if multi:
            out[name] = {"facts": facts, "multi_ref_ctes": multi}
    return out


def main() -> int:
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "CTE_REEXPANSION_SCAN_r13.json")
    static_only = "--static-only" in sys.argv

    cands = static_candidates()
    print(json.dumps({"static_candidates": len(cands)}))
    result = {"metric": "cte_reexpansion_scan_r13",
              "static_candidates": cands}

    if not static_only:
        from shredder_spark import queries as qm
        from shredder_spark.catalog import register_views
        from shredder_spark.session import get_spark
        sf = os.environ.get("SCAN_SF_DIR", "/root/testdata/sf0.01")
        spark = get_spark("cte-reexpansion-scan")
        spark.sparkContext.setLogLevel("ERROR")
        register_views(spark, sf, force=True)
        reg = qm.registry()
        live = {}
        for name in sorted(cands):
            try:
                df = reg[name].run(spark, sf)
                # collect (not a noop write): the write would plan its
                # OWN QueryExecution and leave df's un-executed — the
                # final (post-AQE, stage-reuse-resolved) plan is only
                # on an executed df's own QE
                df.collect()
                ep = df._jdf.queryExecution().executedPlan().toString()
                final = ep.split("+- == Initial Plan ==")[0]
                scans = {}
                for t in cands[name]["facts"]:
                    n = len(re.findall(
                        rf"FileScan parquet[^\n]*{t}\.parquet", final))
                    if n:
                        scans[t] = n
                dup = sum(max(0, n - 1) for n in scans.values())
                live[name] = {"final_fact_scans": scans,
                              "duplicated": dup,
                              "reused_exchanges": final.count(
                                  "ReusedExchange")}
            except Exception as exc:  # noqa: BLE001
                live[name] = {"error": str(exc)[:200]}
        result["live_at_sf"] = sf
        result["live"] = live
        dup_list = sorted(
            ((n, d["duplicated"]) for n, d in live.items()
             if d.get("duplicated")), key=lambda kv: -kv[1])
        result["live_duplicated_ranked"] = dup_list
        print(json.dumps({"live_duplicated": dup_list}))
        spark.stop()

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print("written:", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
