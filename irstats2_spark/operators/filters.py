"""ETL record filters: Robots (P8) and Repeat/double-click (P9).

P8 (Filter/Robots.pm:13-150): drop a record when lowercased UA matches an
alternation of UA regex fragments, or the IP matches an alternation of
escaped prefixes (unanchored =~, like the reference). Pattern lists load
from files (one pattern per line, '#' comments, same format as the
reference's robots_ua.txt / robots_ip.txt) or fall back to a small
built-in list. The compiled alternation is a single rlike => one
codegen'd regex per row, no Python, no shuffle.

P9 (Filter/Repeat.pm:63-102): order-dependent stateful dedup. The anchor
is the time of the last KEPT event per key `epid-docid-ip` (downloads) /
`epid-X-ip` (views): an event within `timeout` seconds of the anchor is
dropped and does NOT refresh the anchor. A sliding `lag()` window is NOT
equivalent (it would refresh on dropped events) — the exact operator is a
per-key sequential fold via applyInPandas. Keys contain the client IP, so
group cardinality is huge and groups are tiny: the grouped shuffle is
balanced by construction, and state never leaves one partition.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Minimal built-in robot UA fragments (lowercase regex fragments, matched
# against lower(ua)). The reference ships a ~800-line public list; ours is
# intentionally small — production deployments pass their own file.
DEFAULT_ROBOT_UA_PATTERNS = [
    "googlebot", "msnbot", "bingbot", "slurp", "crawler", "spider",
    "curl", "wget", "httrack", "libwww", "python-requests", "scrapy",
    "yandexbot", "baiduspider", "duckduckbot", "archive\\.org_bot",
    "semrushbot", "ahrefsbot", "mj12bot", "dotbot", "petalbot", "bot/",
    "robot", "nutch", "heritrix",
]
DEFAULT_ROBOT_IP_PREFIXES: list[str] = []


def load_pattern_file(path: str) -> list[str]:
    """One pattern per line; blank lines and '#' comments skipped;
    whitespace stripped (Robots.pm:43-48,73-81)."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = "".join(line.split())
            if not line or line.startswith("#"):
                continue
            out.append(line)
    return out


def _ip_prefix_regex(prefixes: list[str]) -> str | None:
    """Robots.pm:103-113: append '.' to sub-/24 prefixes, escape dots."""
    pats = []
    for p in prefixes:
        if not p:
            continue
        if p.count(".") < 3 and not p.endswith("."):
            p += "."
        pats.append(p.replace(".", "\\."))
    return "|".join(pats) or None


def robots_filter(
    df: DataFrame,
    ua_col: str = "requester_user_agent",
    ip_col: str = "requester_id",
    ua_patterns: list[str] | None = None,
    ip_prefixes: list[str] | None = None,
    ua_file: str | None = None,
    ip_file: str | None = None,
) -> DataFrame:
    """P8: return only non-robot rows."""
    ua_patterns = list(ua_patterns if ua_patterns is not None else DEFAULT_ROBOT_UA_PATTERNS)
    ip_prefixes = list(ip_prefixes if ip_prefixes is not None else DEFAULT_ROBOT_IP_PREFIXES)
    if ua_file and os.path.exists(ua_file):
        ua_patterns = load_pattern_file(ua_file)
    if ip_file and os.path.exists(ip_file):
        ip_prefixes = load_pattern_file(ip_file)

    keep = F.lit(True)
    if ua_patterns:
        ua_re = "|".join(ua_patterns)
        keep = keep & ~(
            F.col(ua_col).isNotNull() & F.lower(F.col(ua_col)).rlike(ua_re)
        )
    ip_re = _ip_prefix_regex(ip_prefixes)
    if ip_re:
        keep = keep & ~(
            F.col(ip_col).isNotNull() & F.col(ip_col).rlike(ip_re)
        )
    return df.filter(keep)


def repeat_key(epid_col, docid_col, ip_col):
    """The reference's dedup key (Repeat.pm:77-87)."""
    return F.concat_ws(
        "-",
        epid_col.cast("string"),
        F.coalesce(docid_col.cast("string"), F.lit("X")),
        ip_col,
    )


def repeat_filter(
    df: DataFrame,
    epoch_col: str = "epoch",
    key_cols: tuple[str, str, str] = ("referent_id", "referent_docid", "requester_id"),
    timeout: int = 3600,
    hybrid: bool = True,
) -> DataFrame:
    """P9 exact semantics: per-key sequential fold.

    Requires an integer/float seconds column ``epoch_col``. Events are
    processed in epoch order per key, matching the reference's file-order
    scan of time-sorted logs.

    Scale design (hybrid=True): real traffic is dominated by keys with 1-2
    events, where a pure-JVM ``lag()`` window IS the exact semantics (the
    anchor-refresh subtlety only matters from the 3rd event on). Keys are
    counted with a window (no extra shuffle beyond the one the window
    needs) and only heavy keys (n >= 3) take the Arrow/applyInPandas fold —
    Python touches a tiny fraction of the data, and the plan stays exact.
    """
    from pyspark.sql import Window

    epid, docid, ip = key_cols
    keyed = df.withColumn("__rk", repeat_key(F.col(epid), F.col(docid), F.col(ip)))
    schema = keyed.schema

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(epoch_col, kind="stable")
        anchor = None
        keep_mask = []
        for t in pdf[epoch_col]:
            if anchor is not None and abs(t - anchor) <= timeout:
                keep_mask.append(False)  # dropped; anchor NOT refreshed
            else:
                keep_mask.append(True)
                anchor = t
        return pdf[pd.Series(keep_mask, index=pdf.index)]

    if not hybrid:
        return keyed.groupBy("__rk").applyInPandas(fold, schema=schema).drop("__rk")

    w = Window.partitionBy("__rk")
    wo = w.orderBy(epoch_col)
    counted = keyed.withColumn("__n", F.count(F.lit(1)).over(w))

    light = counted.filter(F.col("__n") <= 2)
    gap = F.col(epoch_col) - F.lag(F.col(epoch_col)).over(wo)
    light_kept = (
        light.withColumn("__gap", gap)
        .filter(F.col("__gap").isNull() | (F.abs(F.col("__gap")) > timeout))
        .drop("__gap", "__n", "__rk")
    )

    heavy = counted.filter(F.col("__n") >= 3).drop("__n")
    heavy_kept = (
        heavy.groupBy("__rk").applyInPandas(fold, schema=schema).drop("__rk")
    )
    return light_kept.unionByName(heavy_kept)


def repeat_filter_window_approx(
    df: DataFrame,
    epoch_col: str = "epoch",
    key_cols: tuple[str, str, str] = ("referent_id", "referent_docid", "requester_id"),
    timeout: int = 3600,
) -> DataFrame:
    """Documented approximation: keep rows whose gap from the PREVIOUS
    event (kept or not) exceeds timeout. Cheaper (pure window, no Python)
    but refreshes the anchor on dropped events — counts can be lower than
    the exact operator on long click-bursts. Streaming equivalent:
    dropDuplicatesWithinWatermark on the key.
    """
    from pyspark.sql import Window

    epid, docid, ip = key_cols
    keyed = df.withColumn("__rk", repeat_key(F.col(epid), F.col(docid), F.col(ip)))
    w = Window.partitionBy("__rk").orderBy(epoch_col)
    prev = F.lag(F.col(epoch_col)).over(w)
    return (
        keyed.withColumn("__gap", F.col(epoch_col) - prev)
        .filter(F.col("__gap").isNull() | (F.col("__gap") > timeout))
        .drop("__rk", "__gap")
    )
