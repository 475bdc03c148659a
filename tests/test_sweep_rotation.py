"""Age-aware driver-sweep rotation (registry order IS sweep order).

The driver's correctness sweep covers the first 50 registry entries each
round. ``_load_all`` must therefore order the registry so that (a) queries
with no green driver row in any ``CORRECTNESS_r*.json`` come first, and
(b) confirmed queries follow oldest-evidence-first, so rows that predate a
testdata regeneration age back into the sweep instead of counting as
confirmed forever (round-3 verdict, "What's wrong" #1).
"""

from __future__ import annotations

from bigdata_meteo_datalake_spark.queries import _driver_confirmed_rounds, queries


def test_never_confirmed_queries_sort_first():
    names = list(queries())
    newest = _driver_confirmed_rounds()
    rounds = [newest.get(n, 0) for n in names]
    # ordering is monotone non-decreasing in newest-green-round
    assert rounds == sorted(rounds), "registry must be ordered oldest-evidence-first"


def test_sweep_window_prefers_stale_evidence():
    names = list(queries())
    newest = _driver_confirmed_rounds()
    if not newest:
        return  # fresh clone with no driver artifacts: nothing to assert
    swept, unswept = names[:50], names[50:]
    worst_swept = max(newest.get(n, 0) for n in swept)
    best_unswept = min((newest.get(n, 0) for n in unswept), default=worst_swept)
    assert worst_swept <= best_unswept, (
        "a fresher-confirmed query occupies a sweep slot while a staler one waits"
    )


def test_confirmed_rounds_reads_driver_artifacts():
    newest = _driver_confirmed_rounds()
    # in this repo, round artifacts r01..r03 exist and every green name maps
    # to a positive round number
    assert all(isinstance(r, int) and r >= 1 for r in newest.values())
