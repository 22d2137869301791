"""Report composition + result cache (SURVEY §3.1 step 4, §3.2, §4).

The reference's report page instantiates one view per configured item
with a cloned context (Screen/IRStats2/Report.pm:101-173), each view's
AJAX request is served through an MD5-keyed file cache
(cgi/stats/get:76-99; key Utils.pm:676-692), and the nightly ETL clears
then pre-warms the cache for configured reports
(bin/stats/process_stats:144-159). Here:

- ``run_report`` executes every item of a ReportDef against the store,
  reproducing Table.pm:57-85's ``top`` routing (top='eprint' => group by
  eprintid; top=<the item's datatype> => group by the fact value column;
  top=<set name> => grouping join) and per-item context isolation.
- ``ResultCache`` stores collected results as JSON keyed by the MD5 of
  the canonical (sorted) parameter dict — same invalidation story as the
  reference: clear + pre-warm after each ETL run.

Caching collected rows is an API-layer concern: entries are top-N tables
and densified series (KB-sized), never raw data.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import replace

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from irstats2_spark.plans.builder import StatsStore, compile_context, sum_all
from irstats2_spark.plans.context import Context, QueryOptions
from irstats2_spark.plans.registry import Registry, ReportItem
from irstats2_spark.plans.views import graph_series, key_figures


def _run_table(
    store: StatsStore, ctx: Context, item: ReportItem
) -> DataFrame:
    """Table.pm:37-89 routing: `top` selects the grouping axis."""
    top = item.options.get("top", "eprint")
    limit = item.options.get("limit", 10)
    opts = QueryOptions(
        limit=None if limit == "all" else int(limit),
        data_min=item.options.get("data_min"),
    )
    if top == "eprint":
        ctx = replace(ctx, grouping="eprint")
    elif top == item.datatype:
        ctx = replace(ctx, grouping="value")
    else:  # a set name: top authors/divisions/... (grouping join)
        ctx = replace(ctx, grouping=top)
    return compile_context(store, ctx, opts)


def run_report(
    spark: SparkSession,
    store: StatsStore,
    registry: Registry,
    report: str = "main",
    base_context: Context | None = None,
    today: dt.date | None = None,
    privileges: frozenset[str] | set[str] = frozenset(),
) -> dict[str, object]:
    """Execute every item of a report; returns {item_key: DataFrame|dict}.
    Each item gets its OWN context clone (Report.pm:133: isolation);
    items with an unmet ``priv`` or an ``appears`` list not matching the
    context's set_name are skipped."""
    rdef = registry.reports[report]
    base = base_context or Context()
    out: dict[str, object] = {}
    for i, item in enumerate(rdef.items):
        # per-item gating (Report.pm:112-117, z_irstats2.pl:431-434)
        if item.priv is not None and item.priv not in privileges:
            continue
        if item.appears is not None and base.set_name not in item.appears:
            continue
        ctx = replace(
            base,
            datatype=item.datatype,
            datafilter=item.datafilter,
            grouping=item.grouping or base.grouping,
        )
        key = f"{i}_{item.plugin.lower()}_{item.datatype}"
        if item.plugin == "KeyFigures":
            metrics = {m.name: m.context for m in registry.metrics.values()
                       if m.context.datatype in store.facts}
            out[key] = key_figures(store, metrics, today=today)
        elif item.plugin == "Graph":
            out[key] = graph_series(
                spark,
                store,
                ctx,
                resolution=item.options.get("date_resolution", "day"),
                cumulative=item.options.get("cumulative", False),
                show_average=item.options.get("show_average", False),
                today=today,
            )
        elif item.plugin == "Counter":
            out[key] = sum_all(compile_context(store, ctx, today=today))
        elif item.plugin in ("Table", "PieChart"):
            # PieChart.pm:32-85 routes `top` exactly like Table.pm:57-85
            out[key] = _run_table(store, ctx, item)
        elif item.plugin == "GeoChart":
            # GeoChart.pm:16-21: select fields=['value'] — group the fact
            # by its value column (country codes)
            out[key] = compile_context(
                store, replace(ctx, grouping="value"), today=today
            )
        elif item.plugin == "Grid":
            # Grid.pm: layout container — run the nested items
            from irstats2_spark.plans.registry import ReportDef

            sub = ReportDef(name=f"{rdef.name}.grid{i}",
                            items=tuple(item.options.get("items", ())))
            registry.reports[sub.name] = sub
            out[key] = run_report(
                spark, store, registry, sub.name, base, today, privileges
            )
        elif item.plugin == "ReportHeader":
            continue  # presentational only (ReportHeader.pm)
        else:
            raise ValueError(f"unknown view plugin '{item.plugin}'")
    return out


class ResultCache:
    """MD5-keyed JSON file cache of collected results (Utils.pm:654-692)."""

    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    @staticmethod
    def key(params: dict) -> str:
        canonical = json.dumps(
            {str(k): str(v) for k, v in params.items()}, sort_keys=True
        )
        return hashlib.md5(canonical.encode("utf-8")).hexdigest()

    def _path(self, params: dict) -> str:
        return os.path.join(self.dir, self.key(params) + ".ir2")

    def get(self, params: dict):
        p = self._path(params)
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return None

    def put(self, params: dict, rows: list[dict]) -> None:
        tmp = self._path(params) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rows, fh)
        os.replace(tmp, self._path(params))

    def clear(self) -> int:
        """Nightly invalidation (process_stats:144-150)."""
        n = 0
        for f in os.listdir(self.dir):
            if f.endswith(".ir2"):
                os.remove(os.path.join(self.dir, f))
                n += 1
        return n

    def fetch_or_compute(self, params: dict, compute) -> list[dict]:
        hit = self.get(params)
        if hit is not None:
            return hit
        df = compute()
        rows = [r.asDict() for r in df.collect()]
        self.put(params, rows)
        return rows


def prewarm_report(
    spark: SparkSession,
    store: StatsStore,
    registry: Registry,
    cache: ResultCache,
    report: str = "main",
    today: dt.date | None = None,
) -> int:
    """Post-ETL pre-warm of a report's panels (process_stats:151-159)."""
    results = run_report(spark, store, registry, report, today=today)
    n = 0
    for key, res in results.items():
        params = {"report": report, "item": key}
        if isinstance(res, DataFrame):
            cache.fetch_or_compute(params, lambda r=res: r)
        else:  # key-figures dict
            cache.put(params, [res])
        n += 1
    return n
