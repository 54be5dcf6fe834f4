"""Shared scaling-canary annotations (round-16 verdict task 4).

One table consumed by both scaling_report.py (single decade) and
scaling_trend.py (cross-decade), so the adjudication of a flagged
query cannot drift between the two views.

LINEAR_BY_CONSTRUCTION: queries expected to sit AT the linear line
(their candidate/edge counts grow linearly with the data BY DATASET
CONSTRUCTION — gen_sf1.py's per-replica word-tagging / orthogonal
transforms). The trend tool renders these "at the line (expected)"
instead of DRIFT; they still fail on a genuine super-linear reading
unless a CONTROL exonerates them (below).

CONTROLS: a query whose algorithm CHANGES PATH as data grows (q52's
adaptive CC switches driver→distributed past 2^20 edges) can read
super-linear across exactly the decade where the switch crosses — the
ratio conflates linear data growth with a one-time path constant, not
asymptotic super-linearity. The control is the same algorithm FORCED
onto the big-data path at both ends (q75 = forced-distributed CC): if
the control's ratio over the same decade is linear (<= 10), the
flagged reading is attributable to the documented switch and demotes
to "PATH-SWITCH (control …)"; if the control is ALSO super-linear,
both fail — the exemption never masks a real regression in the
underlying distributed algorithm.
"""

LINEAR_BY_CONSTRUCTION = {
    "q52_dedup_clusters": (
        "edge count linear by data construction; crosses the 2^20-edge "
        "CC driver->distributed switch near sf10 (pays the distributed "
        "constant once)"),
    "q75_dedup_clusters_distributed": (
        "edge count linear by data construction; deliberate "
        "full-convergence distributed CC (high per-round variance)"),
    "q95_corpus_prep_ledger": (
        "LSH-candidate + CC ledger; candidate pairs linear by data "
        "construction (per-replica shingle tagging)"),
}

CONTROLS = {
    "q52_dedup_clusters": "q75_dedup_clusters_distributed",
}
