"""Pin the bench self-adjudication semantics (round 10, VERDICT r9
#1) — pure-function tests over bench._clean_walls / _published /
_is_suspect, using the interference scenarios observed LIVE while the
harness was built:

* a transient ~20-core foreign burst polluted 2 of 3 reps (a sweep
  read 112 s against a quiet 87 s band; q_psi's interval measured
  22.9 ambient cores) — the published median must come from the
  clean rep(s);
* walls [1.0, 2.5, 2.6] with quiet ambient trip the final
  median>2x-min criterion but not max>3x-min — the initial pass must
  flag them too, or `contaminated` would be decided on a query that
  never got its exonerating re-run;
* the r8/r9 failure mode: a record taken entirely under interference
  must never publish clean.

No SparkSession: bench.py's adjudication layer is deliberately pure.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


QUIET = 0.1  # ambient cores on an idle box
HOT = 5.0    # ambient cores during a measured foreign burst


def test_clean_median_ignores_interfered_reps():
    # the live r10 scenario: reps 1-2 ran against a foreign burst
    walls, amb = [2.5, 2.6, 1.0], [HOT, HOT, QUIET]
    assert bench._clean_walls(walls, amb) == [1.0]
    assert bench._published(walls, amb) == 1.0
    # initial pass flags it (spread AND ambient); after a quiet rerun
    # appends another clean sample, the final pass exonerates it
    assert bench._is_suspect(walls, amb)
    walls2, amb2 = walls + [1.05], amb + [QUIET]
    assert bench._published(walls2, amb2) == 1.025
    assert not bench._is_suspect(walls2, amb2, final=True)


def test_quiet_run_is_not_suspect():
    walls, amb = [1.0, 1.05, 0.98], [QUIET] * 3
    assert not bench._is_suspect(walls, amb)
    assert not bench._is_suspect(walls, amb, final=True)
    assert bench._published(walls, amb) == 1.0


def test_initial_trigger_is_superset_of_final():
    # [1.0, 2.5, 2.6]: median 2.5 > 2x min with delta > floor, but
    # max/min = 2.6 < 3x — the review finding: the initial pass must
    # still flag it so the final verdict never condemns an un-rerun
    # query.
    walls, amb = [1.0, 2.5, 2.6], [QUIET] * 3
    assert bench._is_suspect(walls, amb)          # gets its re-run
    assert bench._is_suspect(walls, amb, final=True)  # still suspect...
    # ...until quiet re-runs drag the published median back down
    walls2, amb2 = walls + [1.02, 1.04], amb + [QUIET, QUIET]
    assert not bench._is_suspect(walls2, amb2, final=True)


def test_all_reps_interfered_stays_suspect():
    # the r8/r9 failure mode: every rep hot -> no clean sample ->
    # suspect at final regardless of spread; published falls back to
    # the all-rep median rather than inventing a number
    walls, amb = [2.4, 2.5, 2.45], [HOT, HOT, HOT]
    assert bench._clean_walls(walls, amb) == []
    assert bench._published(walls, amb) == 2.45
    assert bench._is_suspect(walls, amb)
    assert bench._is_suspect(walls, amb, final=True)


def test_sub_floor_jitter_never_flags():
    # a 50-vs-140 ms query is 2.8x spread but under the 0.3 s floor —
    # trivia must not earn re-runs
    walls, amb = [0.05, 0.14, 0.06], [QUIET] * 3
    assert not bench._is_suspect(walls, amb)
    assert not bench._is_suspect(walls, amb, final=True)


def test_lone_spike_cannot_hold_the_median_up():
    # one 10x outlier among quiet reps: flagged initially (max/min),
    # but the published median is already clean and the final pass
    # exonerates without needing the re-run's extra sample
    walls, amb = [1.0, 10.0, 1.02], [QUIET] * 3
    assert bench._is_suspect(walls, amb)
    assert bench._published(walls, amb) == 1.02
    assert not bench._is_suspect(walls, amb, final=True)
