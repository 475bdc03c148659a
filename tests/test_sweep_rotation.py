"""Age-aware driver-sweep rotation (registry order IS sweep order).

The driver's correctness sweep covers the first 50 registry entries each
round. ``_load_all`` orders the registry in three bands (round-13):
(a) queries with no green driver row in any ``CORRECTNESS_r*.json``
come first; (b) PRIORITY queries (tagged ``parity`` or in bench.py's
headline set) whose evidence is PRIORITY_RESWEEP_ROUNDS+ old jump the
tail; (c) everything else follows oldest-evidence-first, so rows that
predate a testdata regeneration age back into the sweep instead of
counting as confirmed forever (round-3 verdict; banding round-12
verdict items 4/8). The full band-sort invariant is locked in
tests/test_round13_props.py::test_sweep_order_bands.
"""

from __future__ import annotations

from bigdata_meteo_datalake_spark.queries import (
    PRIORITY_RESWEEP_ROUNDS,
    _bench_query_names,
    _driver_confirmed_rounds,
    queries,
)


def test_never_confirmed_queries_sort_first():
    names = list(queries())
    newest = _driver_confirmed_rounds()
    rounds = [newest.get(n, 0) for n in names]
    # never-confirmed (round 0) queries are a strict prefix
    n_zero = sum(1 for r in rounds if r == 0)
    assert all(r == 0 for r in rounds[:n_zero])
    assert all(r > 0 for r in rounds[n_zero:])


def test_non_priority_tail_stays_oldest_first():
    """Within the non-priority band the old invariant holds: monotone
    non-decreasing in newest-green-round."""
    from bigdata_meteo_datalake_spark.queries import REGISTRY

    names = list(queries())
    newest = _driver_confirmed_rounds()
    bench = _bench_query_names()
    cur = max(newest.values(), default=0) + 1
    tail = [
        newest[n] for n in names
        if newest.get(n, 0) > 0
        and not (("parity" in REGISTRY[n].tags or n in bench)
                 and newest[n] <= cur - PRIORITY_RESWEEP_ROUNDS)
    ]
    assert tail == sorted(tail), (
        "non-priority confirmed queries must stay oldest-evidence-first"
    )


def test_sweep_window_prefers_stale_evidence():
    """No never-confirmed query waits outside the window while a
    confirmed one occupies a slot (band 0 before bands 1/2)."""
    names = list(queries())
    newest = _driver_confirmed_rounds()
    if not newest:
        return  # fresh clone with no driver artifacts: nothing to assert
    unswept = names[50:]
    assert all(newest.get(n, 0) > 0 for n in unswept), (
        "a never-confirmed query waits outside the sweep window"
    )


def test_confirmed_rounds_reads_driver_artifacts():
    newest = _driver_confirmed_rounds()
    # in this repo, round artifacts r01..r03 exist and every green name maps
    # to a positive round number
    assert all(isinstance(r, int) and r >= 1 for r in newest.values())
