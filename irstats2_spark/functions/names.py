"""Name normalization (SURVEY §2.8 F8): the reference renders author names
"Family, Given" and applies English name-casing (Sets.pm:487-577, which
embeds the public Lingua::EN::NameCase algorithm).

Implemented as pure Python (string-scalar, no Spark deps) so it can be
unit-tested directly, wrapped in a vectorized pandas UDF for the dimension
build. Dimension builds touch eprint-cardinality data (millions, not
billions of rows), so a pandas UDF here is off the hot path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Mac-prefixed surnames that are NOT "Mac + capitalized rest"
# (the classic NameCase exception list).
_MAC_EXCEPTIONS = {
    "MacEvicius": "Macevicius",
    "MacHado": "Machado",
    "MacHar": "Machar",
    "MacHin": "Machin",
    "MacHlin": "Machlin",
    "MacIas": "Macias",
    "MacIulis": "Maciulis",
    "MacKie": "Mackie",
    "MacKle": "Mackle",
    "MacKlin": "Macklin",
    "MacQuarie": "Macquarie",
    "MacOmber": "Macomber",
    "MacIn": "Macin",
    "MacKintosh": "Mackintosh",
    "MacKen": "Macken",
    "MacHen": "Machen",
    "MacHiel": "Machiel",
    "MacIol": "Maciol",
    "MacKell": "Mackell",
    "MacKlem": "Macklem",
    "MacKrell": "Mackrell",
    "MacLin": "Maclin",
    "MacKey": "Mackey",
    "MacKley": "Mackley",
    "MacHell": "Machell",
    "MacHon": "Machon",
    "MacBeth": "Macbeth",
}

_ROMAN_RE = re.compile(
    r"\b((?:[Xx]{1,3}|[Xx][Ll]|[Ll][Xx]{0,3})?"
    r"(?:[Ii]{1,3}|[Ii][VvXx]|[Vv][Ii]{0,3})?)\b"
)


def name_case(name: str | None) -> str | None:
    """English name-casing: 'VAN DER BERG' -> 'van der Berg' etc."""
    if not name:
        return None
    s = name.lower()
    s = re.sub(r"\b(\w)", lambda m: m.group(1).upper(), s)
    s = re.sub(r"('\w)\b", lambda m: m.group(1).lower(), s)

    if re.search(r"\bMac[A-Za-z]{2,}[^aciozj]\b", s) or re.search(r"\bMc", s):
        s = re.sub(
            r"\b(Ma?c)([A-Za-z]+)",
            lambda m: m.group(1) + m.group(2)[:1].upper() + m.group(2)[1:],
            s,
        )
        for wrong, right in _MAC_EXCEPTIONS.items():
            s = re.sub(r"\b" + wrong, right, s)
        s = re.sub(r"\bMacisaac", "MacIsaac", s)
    s = s.replace("Macmurdo", "MacMurdo")

    # particles: son-of/daughter-of prefixes in various languages
    s = re.sub(r"\bAl(?=\s+\w)", "al", s)
    s = re.sub(r"\bAp\b", "ap", s)
    s = re.sub(r"\bBen(?=\s+\w)", "ben", s)
    s = re.sub(r"\bDell([ae])\b", r"dell\1", s)
    s = re.sub(r"\bD([aeiu])\b", r"d\1", s)
    s = re.sub(r"\bDe([lr])\b", r"de\1", s)
    s = re.sub(r"\bEl\b", "el", s)
    s = re.sub(r"\bLa\b", "la", s)
    s = re.sub(r"\bL([eo])\b", r"l\1", s)
    s = re.sub(r"\bVan(?=\s+\w)", "van", s)
    s = re.sub(r"\bVon\b", "von", s)

    # roman numerals back to uppercase (Henry Viii -> Henry VIII)
    s = _ROMAN_RE.sub(lambda m: m.group(1).upper(), s)
    return s


def normalise_name(family: str | None, given: str | None) -> str | None:
    """Sets.pm:488-500: '<Family>, <Given>' (or family alone), name-cased."""
    g = (given or "").strip()
    f = (family or "").strip()
    if not f and not g:
        return None
    return name_case(f"{f}, {g}" if g else f)


@F.pandas_udf(StringType())
def normalise_name_udf(family: pd.Series, given: pd.Series) -> pd.Series:
    return pd.Series(
        [normalise_name(f, g) for f, g in zip(family, given)], dtype="object"
    )
