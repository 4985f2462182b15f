"""Automatic materialized-view refresh for streaming pipelines: a
``StreamingQueryListener`` that advances every registered view over a
store table whenever a streaming query lands rows — the missing hook
between the native store sink (which commits in a session-less worker
and therefore cannot run the refresh itself) and
``refresh_all_matviews`` (which needs the driver's SparkSession).

Shape: ``onQueryProgress`` fires on the driver's listener thread after
each micro-batch; the listener filters to the named query (or any),
skips zero-row batches, and calls ``refresh_all_matviews`` — whose
pending-window claim, per-view lock, and ``_mv_hw`` fence make a
refresh racing the NEXT micro-batch (or a manual refresh) converge
rather than double-net (operators/matview.py docstring). A refresh
failure is recorded on ``listener.errors`` and never thrown — a
listener exception would otherwise kill the listener bus, taking every
other listener with it.

At scale this is the continuous-aggregate pipeline: ingest stream →
store sink (exactly-once epochs) → views advance within one
micro-batch of the data, each refresh costing only the batch's changed
files plus the touched view partitions.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

from geo_explorer_etl_spark.operators.matview import refresh_all_matviews
from geo_explorer_etl_spark.sources.store import TableStore


class MatviewRefresher(StreamingQueryListener):
    """Refreshes registered views after each data-bearing micro-batch.

    ``table`` scopes the refresh to views DIRECTLY over that table
    (cascades refresh with ``table=None`` — the refresh_all rule);
    ``query_name`` filters progress events to one named query so an
    unrelated stream in the same session doesn't trigger refreshes.
    ``refreshes`` counts the calls that advanced at least one view;
    ``errors`` collects stringified refresh failures (never raised)."""

    def __init__(
        self,
        store: TableStore,
        table: str | None = None,
        query_name: str | None = None,
    ):
        self._store = store
        self._table = table
        self._query_name = query_name
        self.refreshes = 0
        self.errors: list[str] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        if self._query_name is not None and p.name != self._query_name:
            return
        if int(p.numInputRows or 0) <= 0:
            return  # empty batch: nothing landed, nothing to advance
        try:
            reports = refresh_all_matviews(self._store, self._table)
            if any(not r.get("noop", False) for r in reports.values()):
                self.refreshes += 1
        except Exception as e:  # noqa: BLE001 — listener must not throw
            self.errors.append(f"{type(e).__name__}: {e}")


def attach_matview_refresher(
    spark,
    store: TableStore,
    table: str | None = None,
    query_name: str | None = None,
) -> MatviewRefresher:
    """Register the listener on the session and return it (keep the
    handle: ``detach_matview_refresher`` needs it, and its
    ``refreshes``/``errors`` are the observability surface)."""
    listener = MatviewRefresher(store, table, query_name)
    spark.streams.addListener(listener)
    return listener


def detach_matview_refresher(spark, listener: MatviewRefresher) -> None:
    spark.streams.removeListener(listener)
