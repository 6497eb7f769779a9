"""Operator registry modules.

Cache contract (ADVICE r4): several operators persist() an expensive
shared subframe IN-PLAN because it feeds multiple consumers and Spark
has no cross-branch common-subexpression materialization
(text_sparse_sim, graph_triangles, graph_link_predict, corpus_card,
sim_ivf_pq, dedup_recall_report, sim_recall_report — rationale in
SCALE.md "Plan-reuse persists"). The persisted blocks belong to the
RETURNED DataFrame's plan, so the operator cannot unpersist them before
the caller has executed it — a long-lived session that invokes these
entries repeatedly must call ``spark.catalog.clearCache()`` between
invocations (as tools/selfcheck.py and bench.py do) or unpersist after
consuming the result; otherwise cached blocks accumulate and squeeze
executor storage memory. At cluster scale the same frames would be
written as explicit intermediate tables instead, which makes the
lifecycle a materialization policy rather than a session-cache one.
"""
