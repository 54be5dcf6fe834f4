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
        "UNCAPPED LSH by contract (exact recall): candidate volume is "
        "quadratic in hot-bucket mass (round-16 measurement: 121k->11.1M "
        "candidates for 10x data at sf1->sf10, max bucket 35->265, while "
        "verified edges stay linear 2,555->25,557 — r15's 'crosses the "
        "CC driver->distributed switch' note was refuted by the edge "
        "count, 40x below the 2^20 threshold); its capped twin q105 is "
        "the documented scale path"),
    "q75_dedup_clusters_distributed": (
        "edge count linear by data construction; deliberate "
        "full-convergence distributed CC (high per-round variance)"),
    "q95_corpus_prep_ledger": (
        "LSH-candidate + CC ledger over the exact-deduped set; "
        "candidate pairs linear by data construction (per-replica "
        "shingle tagging)"),
}

# control = the same pipeline with the documented large-scale
# mitigation applied (q105 = q52 with the hot-bucket cap, the q76/q77
# salting-pair precedent): a super-linear q52 with a linear q105
# demotes to MITIGATED — the engine's scale path holds; if the capped
# twin ever reads super-linear too, both fail.
CONTROLS = {
    "q52_dedup_clusters": "q105_dedup_clusters_capped",
}

# RISING_EXPECTED: queries whose decade-over-decade ratio GROWTH is
# measured and adjudicated (scaling_trend.py's trajectory rule,
# round-17: a consecutive-decade ratio that doubles while material is
# the q104 signature one decade before it crosses the line). Unlike
# LINEAR_BY_CONSTRUCTION (at-the-line adjudications), an entry here
# must cite the MEASUREMENT showing the growth is the approach to the
# linear asymptote (fixed overhead amortizing against linear work),
# not acceleration — e.g. a further decade whose ratio stops growing.
RISING_EXPECTED = {
    "q73_shark_delivery": (
        "ratio 1.85 -> 7.28 across sf0.1->sf1->sf10 (r16) is overhead "
        "amortization approaching the asymptote; the r17 FOURTH decade "
        "measured and stage-decomposed the asymptote itself (11.1-17.9 "
        "across runs, every stage linear-work — see "
        "SUPERLINEAR_EXPECTED, which bounds it at 20)"),
}

# SUPERLINEAR_EXPECTED: queries whose >10x reading is a MEASURED,
# BOUNDED single-box amplification of linear work — not hidden
# quadratic growth (round-17, the fourth-decade adjudications).
# Unlike CONTROLS (a mitigation twin proves the scale path) this
# records the stage decomposition that explains the reading, plus the
# envelope beyond which the explanation no longer holds and the row
# fails anyway:
#   q73: stage-decomposed at sf10->sf100 (ProbeQ73, single-pass, BOTH
#        heap sizes in r18): bare rollup groupBy 12.0-12.6x, bare
#        sample distinct 8.8-13.4x, delivery-no-sort 15.9-18.8x,
#        +global sort 22.6-23.0x — EVERY stage, including the minimal
#        one-shuffle rollup, amplifies, so no delivery-plan rework can
#        go below its own bare first stage. The r17 memory sentence
#        ("fixed 32 GiB against 10x cardinality") was TESTED and
#        REFUTED in r18 by its own mechanism: 2x heap made the query
#        1.49x SLOWER (G1 pause growth), ParallelGC 1.21x slower, and
#        the r17 width A/B had already moved it only 8%. Corrected
#        mechanism: fixed-core amplification — 10x data on the same
#        32 threads costs >=10x by arithmetic, plus a 1.2-1.7x
#        allocator/page-cache/GC residual that grows with PER-TASK
#        data volume; a cluster bounds per-task volume by scaling
#        executor COUNT with data, which no single-box knob emulates.
#        CONTRAST case proving the envelope still fails a real
#        regression: quadratic measured 100.5x in the same r17
#        session (q75's uncapped candidates). Whole-query solo sf100
#        readings at the operative 32 GiB config: 11.1-17.9 (r17),
#        16.6 (r18). Envelope 20.
#   (q91 was adjudicated OUT of this table the same round: its first
#   shared-JVM reading of 11.51 dropped to 6.18 in a solo JVM — suite
#   contamination, not the plan; pair mass 10.63x and assign 11.5x
#   probe-measured linear. The compose100 family runs solo JVMs now.)
SUPERLINEAR_EXPECTED = {
    "q73_shark_delivery": 20.0,
}


def asymptotic_ok(q, ratio):
    """True iff `ratio` sits inside the recorded asymptotic envelope."""
    bound = SUPERLINEAR_EXPECTED.get(q)
    return bound is not None and ratio <= bound

# The MITIGATED demotion is BOUNDED (round-17, r16 ADVICE: an
# unbounded exemption would let a regression confined to the uncapped
# path ride the linear control forever): a flagged ratio demotes only
# while it stays within ENVELOPE_FACTOR x the MEASURED expected ratio
# recorded here (q52: 12.6x/decade, the round-16 clean-window
# sf1->sf10 pair). Beyond the envelope — or when a controlled query
# has no recorded expectation — the reading fails loudly as
# SUPER-LINEAR even with a linear control.
MITIGATED_EXPECTED = {
    "q52_dedup_clusters": 12.6,
}
ENVELOPE_FACTOR = 2.0


def within_envelope(q, ratio):
    """True iff `ratio` for query `q` sits inside the recorded
    mitigation envelope. No recorded expectation => never inside."""
    exp = MITIGATED_EXPECTED.get(q)
    return exp is not None and ratio <= ENVELOPE_FACTOR * exp
