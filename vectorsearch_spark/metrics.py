"""Per-query observability counters — the Spark analog of the
reference's in-process metrics registry (util/Metrics.java:20-45:
named counters/timers incremented by index operations, asserted in
tests like api/VectorIndexTest.java:624-665).

Spark already meters every physical operator with SQLMetrics visible in
the executed plan; this module surfaces them to callers as plain named
counters instead of re-counting anything itself. ``observe(name, df)``
runs the action, then harvests:

- ``<name>.wall_ms``      — wall-clock of the action
- ``<name>.rows_out``     — rows returned to the driver
- ``<name>.scan_rows``    — Σ "number of output rows" over scan nodes
- ``<name>.scan_bytes``   — Σ "size of files read" over scan nodes
- ``<name>.shuffle_count``— exchange nodes in the executed plan
- ``queries_total``       — running count across observed queries

The registry is process-wide (one per SparkSession, attached by
``session.get_spark``) and assertable in tests; at cluster scale the
same counters would be exported via a metrics sink, but the
harvest-from-executed-plan mechanism is identical.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Any

from pyspark.sql import DataFrame


def _iter_scala(seq):
    it = seq.iterator()
    while it.hasNext():
        yield it.next()


def _walk_plan(plan):
    """Depth-first over a SparkPlan, descending into the final adaptive
    plan when AQE has resolved it."""
    yield plan
    try:
        nn = str(plan.nodeName())
        if nn.startswith("AdaptiveSparkPlan"):
            yield from _walk_plan(plan.executedPlan())
            return
        if "QueryStage" in nn:  # AQE stage wrappers hide the subtree in .plan()
            yield from _walk_plan(plan.plan())
            return
    except Exception:
        pass
    try:
        for child in _iter_scala(plan.children()):
            yield from _walk_plan(child)
    except Exception:
        return


def _node_metrics(node) -> dict[str, int]:
    out = {}
    try:
        for kv in _iter_scala(node.metrics()):
            out[str(kv._1())] = int(kv._2().value())
    except Exception:
        pass
    return out


class Metrics:
    """Named monotonic counters with a tiny API: inc/get/snapshot."""

    def __init__(self) -> None:
        self._counters: dict[str, int] = defaultdict(int)

    def inc(self, name: str, value: int = 1) -> None:
        self._counters[name] += int(value)

    def get(self, name: str) -> int:
        return self._counters.get(name, 0)

    def snapshot(self) -> dict[str, int]:
        return dict(self._counters)

    def reset(self) -> None:
        self._counters.clear()

    # -- phase instrumentation ----------------------------------------
    def phase(self, name: str):
        """Context manager timing one maintenance/build PHASE — the
        analog of the reference's per-phase histograms
        (util/Metrics.java:20-45: build/vacuum/compact phases each
        record a timer). Records ``<name>.wall_ms`` (cumulative) and
        ``<name>.calls`` so a regression localizes to a phase in-round
        instead of needing an ad-hoc probe (the r5 index_build lesson).
        """
        from contextlib import contextmanager

        @contextmanager
        def _timer():
            t0 = time.time()
            try:
                yield self
            finally:
                self.inc(f"{name}.wall_ms", int((time.time() - t0) * 1000))
                self.inc(f"{name}.calls")

        return _timer()

    # -- query instrumentation ----------------------------------------
    def observe(self, name: str, df: DataFrame) -> list:
        """Collect ``df``, then record its executed-plan SQLMetrics
        under ``<name>.*``. Returns the collected rows."""
        t0 = time.time()
        rows = df.collect()
        self.inc(f"{name}.wall_ms", int((time.time() - t0) * 1000))
        self.inc(f"{name}.rows_out", len(rows))
        self.inc("queries_total")
        try:
            plan = df._jdf.queryExecution().executedPlan()
            for node in _walk_plan(plan):
                nn = str(node.nodeName())
                m = _node_metrics(node)
                if nn.startswith("Scan"):
                    self.inc(f"{name}.scan_rows", m.get("numOutputRows", 0))
                    self.inc(f"{name}.scan_bytes", m.get("filesSize", 0))
                if "Exchange" in nn:
                    self.inc(f"{name}.shuffle_count")
        except Exception:
            # metrics are best-effort; never fail the query over them
            self.inc(f"{name}.harvest_errors")
        return rows


def get_metrics(spark: Any) -> Metrics:
    """The session's metrics registry (created on first access)."""
    reg = getattr(spark, "_vectorsearch_metrics", None)
    if reg is None:
        reg = Metrics()
        spark._vectorsearch_metrics = reg
    return reg
