"""AMiner citation-dump text codec (the reference's one custom format).

Records are blank-line-separated blocks with line-prefix-tagged fields
(``#*`` title, ``#@`` authors, ``#t`` year, ``#c`` venue, ``#index`` id,
``#%`` reference ids — one per line, repeated). Parsed exactly as the
reference does (reference src/cleaning.py:101-108,137-160): a
``spark.read.text(..., lineSep="\\n\\n")`` scan — one row per record — then
pure column expressions per field. Stays fully declarative: the scan is a
plain text source and extraction is whole-stage-codegen'd regexp work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SEPARATOR = "\n\n"

# field name -> (split prefix regex, is multi-line list)
_FIELD_PREFIXES: dict[str, tuple[str, bool]] = {
    "title": (r"#\*", False),
    "authors": ("\n#@", False),
    "year": ("\n#t", False),
    "venue": ("\n#c", False),
    "index": ("\n#index", False),
    "references": ("\n#%", True),
}


def _extract_field(raw: Column, prefix: str, multi: bool) -> Column:
    """First occurrence of a tagged field; ``#%`` reference lines are
    folded into one comma-separated list (reference src/cleaning.py:101-108).
    """
    # F.get (not getItem): a missing field yields NULL instead of an ANSI
    # array-index error (the reference ran Spark 3.5 where getItem was lax).
    if multi:
        items = F.get(F.split(raw, prefix, 2), 1)
        items = F.regexp_replace(items, prefix, ", ")
    else:
        items = F.get(F.split(raw, prefix), 1)
    return F.trim(F.get(F.split(items, "\n"), 0))


def read_aminer(
    spark: SparkSession, path: str, record_separator: str = RECORD_SEPARATOR
) -> DataFrame:
    """Parse an AMiner dump into
    ``(title, authors, year int, venue, index, references, value)``.

    ``value`` keeps the raw (unlowercased) record block; extraction happens
    on the lowercased, trimmed copy, matching reference
    src/cleaning.py:137-160 (including the ``publication venue`` column,
    which this engine names ``venue``).
    """
    text = spark.read.text(path, lineSep=record_separator)
    raw = F.lower(F.trim(F.col("value")))

    cols = [F.col("value")]
    for name, (prefix, multi) in _FIELD_PREFIXES.items():
        extracted = F.trim(_extract_field(raw, prefix, multi))
        if name == "year":
            extracted = extracted.cast("int")
        cols.append(extracted.alias(name))
    return text.select(*cols)


def format_aminer_record(
    title: str,
    authors: str,
    year: int,
    venue: str,
    index: str,
    references: list[str] | None = None,
    abstract: str | None = None,
) -> str:
    """Render one record in AMiner format (used by test fixture writers)."""
    lines = [f"#*{title}", f"#@{authors}", f"#t{year}", f"#c{venue}", f"#index{index}"]
    for ref in references or []:
        lines.append(f"#%{ref}")
    if abstract is not None:
        lines.append(f"#!{abstract}")
    return "\n".join(lines)
