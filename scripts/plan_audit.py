"""Plan audit: capture .explain("formatted") for the flagship queries
and assert the scan/shuffle properties the 100 TB design depends on.

Writes PLANS.md (checked by hand + referenced from BENCH.md):
- parquet scans carry PushedFilters / narrow ReadSchema (pushdown+pruning)
- small-side joins are broadcast
- the index query path filters blocks BEFORE decode
- top-k windows are two-stage (salt pre-reduction before the global window)

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spcht_spark import demo_queries  # noqa: E402
from spcht_spark.session import get_spark  # noqa: E402

AUDITS = {
    # query name → (must-appear regexes, description of what that proves)
    "index_bm25_topk": [
        (r"PushedFilters: \[.*term", "term IN (...) pushed to the blocks scan"),
    ],
    "bm25_topk": [
        (r"Window", "two-stage top-k (salted partial window before global)"),
    ],
    "broadcast_dim_join": [
        (r"BroadcastHashJoin|BroadcastExchange", "dimension tables broadcast"),
    ],
    "max_age_delta": [
        (r"PushedFilters: \[.*(GreaterThan|IsNotNull)", "watermark filter reaches the scan"),
    ],
    "token_count": [
        (r"ReadSchema: struct<doc_id:bigint,text:string>", "column pruning: 2-col read"),
    ],
    "pricing_summary": [
        (r"PushedFilters: \[.*l_shipdate", "date filter pushed down"),
    ],
    "index_facets": [
        (r"PushedFilters: \[.*term", "facet match set from the term-pruned block scan"),
        (r"HashAggregate", "facet counts partial-aggregate map-side"),
    ],
    "index_collapse": [
        (r"PushedFilters: \[.*term", "collapse candidates from the term-pruned block scan"),
        (r"Window", "group-head + salted head-page windows"),
    ],
    "index_suggest": [
        (r"BroadcastHashJoin|BroadcastNestedLoopJoin|BroadcastExchange",
         "misspelled terms broadcast against the dictionary scan"),
    ],
    "index_highlight": [
        (r"BroadcastHashJoin|BroadcastExchange",
         "result page broadcast against the doc store (no corpus shuffle)"),
    ],
    "index_phrase_topk": [
        (r"PushedFilters: \[.*term",
         "phrase terms pushed into the persisted positional-block scan"),
    ],
    "index_group_topk": [
        (r"PushedFilters: \[.*term",
         "grouping candidates from the term-pruned block scan"),
        (r"Window", "per-group + salted head windows"),
    ],
    "index_pivot_facets": [
        (r"PushedFilters: \[.*term",
         "pivot match set from the term-pruned block scan"),
        (r"Expand", "leaf + subtotal levels from ONE rollup Expand pass"),
    ],
    "index_facet_query": [
        (r"PushedFilters: \[.*term",
         "facet-term presence from the term-pruned block scan"),
        (r"HashAggregate",
         "all facet predicates counted in one partial-agg pass"),
    ],
    "index_funcsort": [
        (r"PushedFilters: \[.*term",
         "sort candidates from the term-pruned block scan"),
        (r"ReadSchema: struct<doc_id:bigint,n_chars:bigint>",
         "attrs join pruned to the function's referenced fields"),
        (r"Window", "salted two-stage sort-key window"),
    ],
    "index_parent_join": [
        (r"PushedFilters: \[.*term",
         "child candidates from the term-pruned block scan"),
        (r"HashAggregate",
         "per-parent max/count combine map-side before the shuffle"),
    ],
    "index_export": [
        (r"PushedFilters: \[.*term",
         "export match set from the term-pruned block scan"),
        (r"rangepartitioning\(query_id.*sort_value",
         "range-partitioned distributed sort (no per-query window)"),
    ],
    "index_pivot3": [
        (r"PushedFilters: \[.*term",
         "3-level pivot match set from the term-pruned block scan"),
        (r"Expand", "all three levels from ONE rollup Expand pass"),
    ],
    "index_group_ngroups": [
        (r"PushedFilters: \[.*term",
         "ngroups candidates from the term-pruned block scan"),
        (r"Window", "per-group + salted head windows"),
    ],
    "index_wildcard_topk": [
        (r"PushedFilters: \[.*term",
         "expanded wildcard terms pushed to the blocks scan"),
    ],
    "index_phrase_slop": [
        (r"PushedFilters: \[.*term",
         "slop phrase terms pushed into the positional-block scan"),
    ],
    "index_term_vectors": [
        (r"PushedFilters: \[.*doc_id",
         "doc-store scan pruned to the page's doc ids"),
        (r"BroadcastHashJoin|BroadcastExchange",
         "page term frame broadcast into the dictionary probe"),
    ],
    "index_child_join": [
        (r"PushedFilters: \[.*term",
         "parent-query candidates from the term-pruned block scan"),
        (r"BroadcastHashJoin|BroadcastExchange",
         "k-sized ranked-parents frame broadcast into the attrs expansion"),
        (r"Window", "salted two-stage child ranking"),
    ],
    "index_rtget": [
        (r"PushedFilters: \[.*In\(doc_id",
         "/get ids pushed to the doc-store scan as an IN predicate"),
        (r"ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>",
         "fl column pruning: only requested stored fields read (text never scanned)"),
    ],
    "repetition_signals": [
        (r"ReadSchema: struct<doc_id:bigint,text:string>",
         "column pruning: 2-col read"),
        (r"^(?!.*Exchange hashpartitioning)",
         "in-row signals: no per-doc shuffle in the plan"),
    ],
    "ngram_contamination": [
        (r"BroadcastHashJoin|BroadcastExchange",
         "benchmark shingles broadcast — corpus grams never shuffle vs corpus grams"),
        (r"HashAggregate", "per-doc rollup partial-aggregates map-side"),
    ],
    "pii_scrub": [
        (r"ReadSchema: struct<doc_id:bigint",
         "column pruning to the scrub inputs"),
    ],
    "index_percolate": [
        (r"^(?!.*Exchange hashpartitioning)",
         "percolation is one shuffle-free projection (no index, no Exchange)"),
        (r"explode\(",
         "matches emitted via one array build + explode"),
    ],
    "index_complete": [
        (r"PushedFilters: \[.*StartsWith",
         "prefix batch pushed to the sorted dictionary scan"),
        (r"BroadcastNestedLoopJoin|BroadcastHashJoin|BroadcastExchange",
         "prefix frame broadcast against pruned candidates"),
    ],
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=8)
    lines = ["# PLANS — physical-plan audit (auto-generated by scripts/plan_audit.py)",
             "", f"sf_dir: {sf_dir}. Each query's `.explain(\"formatted\")` is",
             "checked for the scan/shuffle properties the 100 TB design needs.", ""]
    failed = 0
    for name, checks in AUDITS.items():
        df = demo_queries.QUERIES[name](spark, sf_dir)
        # Execute first: with AQE on, the formatted explain of an
        # unexecuted plan is the non-final AdaptiveSparkPlan, which
        # carries NO codegen annotations (round-4 VERDICT #8 — every
        # query reported 0 spans). After execution the final plan's
        # operators are starred with `codegen id : N`.
        df.collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        lines.append(f"## {name}")
        for pattern, claim in checks:
            ok = re.search(pattern, plan) is not None
            failed += 0 if ok else 1
            mark = "PASS" if ok else "FAIL"
            lines.append(f"- {mark}: {claim} (`{pattern}`)")
            print(f"{name}: {mark} {claim}")
        # exchanges from the FINAL plan tree only (the full text repeats
        # each node in the initial tree + detail section); codegen ids
        # live in the detail sections — only executed-final operators
        # are annotated, so the set over the whole text is the final
        # plan's span count.
        tree = plan.split("== Initial Plan ==")[0]
        n_exch = len(re.findall(r"\bExchange\b", tree))
        n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        lines.append(f"- exchanges: {n_exch}, whole-stage-codegen spans: {n_codegen}")
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"\nPLANS.md written; {failed} failed checks")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
