"""Config-driven registries (SURVEY §2.10): processors, filters, metrics,
views, and report definitions — the reference's plugin surface
(Processor.pm:15-26, Handler.pm:1049-1113, View/KeyFigures.pm:13-68,
cfg.d/z_irstats2.pl:319-577) as plain Python registries.

A deployment registers its own processors/filters/metrics exactly like
the reference's $c->{irstats2} config blocks; the defaults mirror the
shipped configuration.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from irstats2_spark.plans.context import Context


@dataclass(frozen=True)
class ProcessorDef:
    """A fact producer: name(s) it provides + builder(silver_df, deps)."""

    provides: tuple[str, ...]
    build: Callable[..., dict[str, DataFrame]]
    dataset: str = "access"  # access | eprint | history
    priority: int = 100


@dataclass(frozen=True)
class FilterDef:
    """A record filter applied before processors (priority order)."""

    name: str
    apply: Callable[[DataFrame], DataFrame]
    priority: int = 100


@dataclass(frozen=True)
class MetricDef:
    """KeyFigures metric: a Context transformer (KeyFigures.pm:13-68)."""

    name: str
    context: Context
    phrase: str = ""


@dataclass(frozen=True)
class ReportItem:
    """One panel of a report page (z_irstats2.pl:319-577).

    ``priv`` is the privilege required to see the panel
    (Screen/IRStats2/Report.pm:112-117); ``appears`` optionally gates the
    panel to specific set contexts (z_irstats2.pl:431-434: e.g. a panel
    shown only on repository-wide pages, set_name=None)."""

    plugin: str  # view name: Graph | Table | Counter | KeyFigures | ...
    datatype: str = "downloads"
    datafilter: str | None = None
    grouping: str | None = None
    options: dict = field(default_factory=dict)
    priv: str | None = None
    appears: tuple[str | None, ...] | None = None  # allowed set_names


@dataclass(frozen=True)
class ReportDef:
    name: str
    items: tuple[ReportItem, ...]


# The reference's default `main` report (z_irstats2.pl:321-364).
DEFAULT_REPORTS: dict[str, ReportDef] = {
    "main": ReportDef(
        name="main",
        items=(
            ReportItem(plugin="KeyFigures"),
            ReportItem(
                plugin="Graph",
                datatype="downloads",
                options={"date_resolution": "month", "graph_type": "column"},
            ),
            ReportItem(plugin="Table", datatype="downloads", options={"top": "eprint"}),
            ReportItem(
                plugin="Table", datatype="referrer", options={"top": "referrer"}
            ),
            ReportItem(
                plugin="Table",
                datatype="search_terms",
                options={"top": "search_terms"},
            ),
        ),
    ),
}


class Registry:
    """Engine-wide plugin registry with priority ordering
    (Handler.pm:1049-1113)."""

    def __init__(self) -> None:
        self.processors: dict[str, ProcessorDef] = {}
        self.filters: list[FilterDef] = []
        self.metrics: dict[str, MetricDef] = {}
        self.reports: dict[str, ReportDef] = dict(DEFAULT_REPORTS)

    def register_processor(self, name: str, p: ProcessorDef) -> None:
        self.processors[name] = p

    def register_filter(self, f: FilterDef) -> None:
        self.filters.append(f)
        self.filters.sort(key=lambda x: x.priority)

    def register_metric(self, m: MetricDef) -> None:
        self.metrics[m.name] = m

    def datatypes(self) -> list[str]:
        out: list[str] = []
        for p in sorted(self.processors.values(), key=lambda x: x.priority):
            out.extend(p.provides)
        return out


def default_registry() -> Registry:
    """Registry mirroring the reference's shipped plugin set."""
    from irstats2_spark.etl import processors as P
    from irstats2_spark.operators.filters import repeat_filter, robots_filter

    reg = Registry()
    reg.register_filter(FilterDef("robots", robots_filter, priority=100))
    reg.register_filter(FilterDef("repeat", repeat_filter, priority=200))
    reg.register_processor(
        "Downloads",
        ProcessorDef(
            provides=("downloads", "views"),
            build=lambda ev: {"downloads": P.downloads(ev), "views": P.views(ev)},
        ),
    )
    reg.register_processor(
        "DocDownloads",
        ProcessorDef(
            provides=("doc_downloads",),
            build=lambda ev: {"doc_downloads": P.doc_downloads(ev)},
        ),
    )
    reg.register_processor(
        "Browsers",
        ProcessorDef(provides=("browsers",), build=lambda ev: {"browsers": P.browsers(ev)}),
    )
    reg.register_processor(
        "Referrer",
        ProcessorDef(provides=("referrer",), build=lambda ev: {"referrer": P.referrer(ev)}),
    )
    reg.register_processor(
        "SearchTerms",
        ProcessorDef(
            provides=("search_terms",),
            build=lambda ev: {"search_terms": P.search_terms(ev)},
        ),
    )
    reg.register_metric(
        MetricDef("downloads", Context(datatype="downloads", range="_ALL_"))
    )
    reg.register_metric(MetricDef("deposits", Context(datatype="deposits", range="_ALL_")))
    return reg
