"""Set / grouping / rendered-value dimension build (SURVEY §2.1 S7, §2.8
F9-F11; reference Sets.pm:222-457, Handler.pm:876-1009).

The reference drops + rebuilds one MySQL table pair per configured set by
scanning the archive row-at-a-time in -eprintid order. Here each set is an
explode/normalize/join over the eprints DataFrame, producing three unified
dimensions (schemas.SET_DIM / GROUPING_DIM / RENDERED_DIM) partitionable
by set_name. The reference's "most recent eprint's rendering wins" rule
(Sets.pm:279-280) becomes an explicit row_number() window.

Set types (Sets.pm:362-457):
- simple: key = raw value (md5 if anon)
- name:   display = name-cased "Family, Given"; key = display (md5 if anon)
- compound: key = lc(subfield value) (md5 if anon); display from the name
  subfield; rows with empty id subfield dropped
- subject: value expands to itself + all ancestors (stats roll up the
  hierarchy); non-postable ancestors dropped unless whitelisted
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from irstats2_spark.functions.names import normalise_name_udf


@dataclass(frozen=True)
class SetConfig:
    """One entry of the sets registry (cfg.d/z_irstats2.pl:161-203)."""

    field_name: str
    name: str | None = None
    type: str = "simple"  # simple | name | compound | subject
    groupings: tuple[str, ...] = ()
    anon: bool = False
    id_field: str = "id"
    blacklist: tuple[str, ...] = ()
    whitelist: tuple[str, ...] = ()  # non-postable subjects to keep

    @property
    def set_name(self) -> str:
        return self.name or self.field_name


DEFAULT_SETS: tuple[SetConfig, ...] = (
    SetConfig(field_name="divisions", groupings=("authors", "type")),
    SetConfig(field_name="subjects", type="subject", groupings=("authors", "type")),
    SetConfig(field_name="type", name="type", groupings=("authors",)),
    SetConfig(
        field_name="creators", name="authors", type="compound", anon=True,
        groupings=("type",),
    ),
)


def _maybe_anon(col, anon: bool):
    """F10 (Sets.pm:341-360): md5 of the utf8 value when the set is anon."""
    return F.md5(col) if anon else col


def subject_closure(subjects: DataFrame, max_depth: int = 16) -> DataFrame:
    """F9: ancestor closure `(subjectid, ancestor)` including self.

    Iterative self-join to fixpoint with a depth bound — subject trees are
    3-4 levels deep in practice (FIXTURES §4); the loop unions per-level
    frontiers, all on a dimension-sized table (broadcastable, never the
    fact side).
    """
    base = subjects.select(
        F.col("subjectid").alias("subjectid"),
        F.col("subjectid").alias("ancestor"),
    )
    parent_of = subjects.select(
        F.col("subjectid").alias("child"), F.col("parent").alias("parent_anc")
    ).filter(F.col("parent_anc").isNotNull())

    closure = base
    frontier = base.select("subjectid", F.col("ancestor").alias("cur"))
    for depth in range(max_depth):
        # fresh alias names per level avoid self-join expression-id clashes
        f, p = f"f{depth}", f"p{depth}"
        nxt = (
            frontier.alias(f)
            .join(parent_of.alias(p), F.col(f"{f}.cur") == F.col(f"{p}.child"), "inner")
            .select(
                F.col(f"{f}.subjectid").alias("subjectid"),
                F.col(f"{p}.parent_anc").alias("cur"),
            )
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(
            nxt.select("subjectid", F.col("cur").alias("ancestor"))
        )
        frontier = nxt
    return closure.distinct()


def _extract_values(eprints: DataFrame, cfg: SetConfig, subjects: DataFrame | None):
    """Explode one set's field into (eprintid, set_value, rendered)."""
    fn = cfg.field_name
    if cfg.type == "compound":
        ex = eprints.select(
            "eprintid", F.explode(F.col(fn)).alias("v")
        ).filter(
            F.col(f"v.{cfg.id_field}").isNotNull() & (F.col(f"v.{cfg.id_field}") != "")
        )
        key = _maybe_anon(F.lower(F.col(f"v.{cfg.id_field}")), cfg.anon)
        rendered = normalise_name_udf(F.col("v.name.family"), F.col("v.name.given"))
        return ex.select(
            "eprintid", key.alias("set_value"), rendered.alias("rendered_set_value")
        )
    if cfg.type == "name":
        ex = eprints.select("eprintid", F.explode(F.col(fn)).alias("v"))
        rendered = normalise_name_udf(F.col("v.family"), F.col("v.given"))
        ex = ex.select("eprintid", rendered.alias("rendered_set_value"))
        return ex.filter(F.col("rendered_set_value").isNotNull()).select(
            "eprintid",
            _maybe_anon(F.col("rendered_set_value"), cfg.anon).alias("set_value"),
            "rendered_set_value",
        )
    if cfg.type == "subject":
        if subjects is None:
            raise ValueError("subject set requires the subjects table")
        ex = eprints.select("eprintid", F.explode(F.col(fn)).alias("raw"))
        # rename closure columns so the two subject-derived sides of the
        # double join don't share expression ids (self-join ambiguity)
        closure = subject_closure(subjects).select(
            F.col("subjectid").alias("cl_subject"),
            F.col("ancestor").alias("cl_ancestor"),
        )
        # keep: self always; ancestors only if postable or whitelisted
        meta = subjects.select(
            F.col("subjectid").alias("meta_subject"),
            "can_post",
            F.col("name").alias("subj_name"),
        )
        expanded = (
            ex.join(F.broadcast(closure), ex.raw == closure.cl_subject, "inner")
            .join(F.broadcast(meta), F.col("cl_ancestor") == meta.meta_subject, "inner")
            .filter(
                (F.col("cl_ancestor") == F.col("raw"))
                | F.col("can_post")
                | F.col("cl_ancestor").isin(*cfg.whitelist)
                if cfg.whitelist
                else ((F.col("cl_ancestor") == F.col("raw")) | F.col("can_post"))
            )
        )
        key = _maybe_anon(F.col("cl_ancestor"), cfg.anon)
        return expanded.select(
            "eprintid", key.alias("set_value"), F.col("subj_name").alias("rendered_set_value")
        )
    # simple: field may be scalar or array
    dtype = dict(eprints.dtypes).get(fn, "string")
    col = F.explode(F.col(fn)) if dtype.startswith("array") else F.col(fn)
    ex = eprints.select("eprintid", col.alias("raw")).filter(
        F.col("raw").isNotNull() & (F.col("raw") != "")
    )
    return ex.select(
        "eprintid",
        _maybe_anon(F.col("raw"), cfg.anon).alias("set_value"),
        F.col("raw").alias("rendered_set_value"),
    )


def build_dimensions(
    eprints: DataFrame,
    sets: tuple[SetConfig, ...] = DEFAULT_SETS,
    subjects: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """S7: produce the three unified dimension tables for all sets.

    Returns {'sets': SET_DIM, 'groupings': GROUPING_DIM,
    'rendered': RENDERED_DIM}.

    Cache lifecycle: each set's extracted values are pinned (two
    consumers: the membership union and the rendered-value window);
    the CALLER owns the pins — an ETL run writes the dimensions and
    then clearCache()s (see pipeline.lifecycle for the contract).
    """
    by_name = {c.set_name: c for c in sets}
    set_parts, rendered_parts = [], []
    extracted: dict[str, DataFrame] = {}

    for cfg in sets:
        vals = _extract_values(eprints, cfg, subjects)
        for b in cfg.blacklist:
            vals = vals.filter(F.col("set_value") != b)
        extracted[cfg.set_name] = vals.cache()
        set_parts.append(
            vals.select(
                F.lit(cfg.set_name).alias("set_name"), "set_value", "eprintid"
            ).distinct()
        )
        # most recent eprint's rendering wins (Sets.pm:279-280)
        w = Window.partitionBy("set_value").orderBy(F.col("eprintid").desc())
        rendered_parts.append(
            vals.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.lit(cfg.set_name).alias("set_name"),
                "set_value",
                "rendered_set_value",
            )
        )

    grouping_parts = []
    for cfg in sets:
        for gname in cfg.groupings:
            if gname not in by_name:
                continue
            gvals = extracted[gname].select(
                "eprintid", F.col("set_value").alias("grouping_value")
            )
            pairs = (
                extracted[cfg.set_name]
                .select("eprintid", "set_value")
                .join(gvals, "eprintid", "inner")
                .select(
                    F.lit(cfg.set_name).alias("set_name"),
                    "set_value",
                    "eprintid",
                    F.lit(gname).alias("grouping_name"),
                    "grouping_value",
                )
                .distinct()
            )
            grouping_parts.append(pairs)

    from functools import reduce

    sets_dim = reduce(DataFrame.unionByName, set_parts)
    rendered_dim = reduce(DataFrame.unionByName, rendered_parts)
    groupings_dim = (
        reduce(DataFrame.unionByName, grouping_parts) if grouping_parts else None
    )
    return {"sets": sets_dim, "groupings": groupings_dim, "rendered": rendered_dim}
