"""Registry window-order invariants (round 7).

`_WINDOW_ORDER` decides which 50 queries the driver's correctness gate
grades each round, so list hygiene is grade-affecting: a duplicate
silently shrinks the window; a missing name appends at the end in
registration order (never silently dropped, but also never where the
rotation policy put it). Pin the invariants instead of trusting the
hand-maintained count comments."""

from sklearn_raster_spark.plans.registry import (
    REGISTRY,
    _WINDOW_ORDER,
    load_all_queries,
)


def test_window_order_is_exact_registry_cover():
    load_all_queries()  # imports all operator modules
    assert len(_WINDOW_ORDER) == len(set(_WINDOW_ORDER)), "duplicate names"
    assert set(_WINDOW_ORDER) == set(REGISTRY), (
        "missing: " + repr(sorted(set(REGISTRY) - set(_WINDOW_ORDER)))
        + " extra: " + repr(sorted(set(_WINDOW_ORDER) - set(REGISTRY)))
    )


def test_window_order_drives_iteration_order():
    ordered = list(load_all_queries())
    assert ordered == list(_WINDOW_ORDER)
