"""String-cleaning operators as native Catalyst expressions.

The reference implements these six operations as row-at-a-time Python UDFs
(reference src/cleaning.py:46-115, D1-D6 in SURVEY.md §2.7). Five of the six
are re-expressed here as pure JVM-side Column expressions (higher-order
array functions + regexp), so the clean stage runs inside whole-stage
codegen with zero Python boundary crossings. The one irreducible Python
piece is Unicode NFKD accent folding (no Spark builtin), kept as an
Arrow-vectorized pandas UDF.

Semantics are bug-for-bug faithful to the reference, including:

- ``sort_authors`` filters empty tokens *before* stripping them
  (reference src/cleaning.py:51-52);
- ``remove_stopwords`` tests the *raw* token against the stopword list
  before edge-punctuation stripping (reference src/cleaning.py:90-95)
  and does NOT trim the final string;
- ``get_num_authors`` maps NULL -> 0 and empty string -> 1
  (``len("".split(",")) == 1``, reference src/cleaning.py:111-115).
"""

from __future__ import annotations

import string

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .stopwords import ENGLISH_STOPWORDS

__all__ = [
    "regex_class",
    "sort_authors",
    "remove_nums",
    "clean_record",
    "remove_accents",
    "remove_stopwords",
    "get_num_authors",
    "CLEAN_RECORD_CHARS",
    "TOKEN_STRIP_CHARS",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def regex_class(chars: str) -> str:
    """Build a Java-regex character class matching exactly ``chars``.

    Escapes the class metacharacters ``\\ ] [ ^ -`` (``-`` is moved to the
    end instead); everything else is literal inside a class.
    """
    body = ""
    has_dash = False
    for ch in chars:
        if ch == "-":
            has_dash = True
        elif ch in "\\]^[&":
            body += "\\" + ch
        else:
            body += ch
    if has_dash:
        body += "-"
    return "[" + body + "]"


# Characters replaced by a space in clean_record (reference
# src/cleaning.py:70: r'!"$%&\'()’:;+.<=>?″`“”/-@[\\]#{|}' — commas preserved).
CLEAN_RECORD_CHARS = "!\"$%&'()’:;+.<=>?″`“”/-@[\\]#{|}"

# Characters stripped from token edges in remove_stopwords (reference
# src/cleaning.py:87,91: string.punctuation + the quote variants + space).
TOKEN_STRIP_CHARS = string.punctuation + "\"“'’″`“”" + " "

_CLEAN_RECORD_RE = regex_class(CLEAN_RECORD_CHARS)
_STRIP_RE = regex_class(TOKEN_STRIP_CHARS)
_EDGE_STRIP_RE = f"^{_STRIP_RE}+|{_STRIP_RE}+$"
_WS_EDGE_RE = r"^\s+|\s+$"


def _strip(c: Column) -> Column:
    """Python ``str.strip()`` (all whitespace, both ends) as an expression."""
    return F.regexp_replace(c, _WS_EDGE_RE, "")


def sort_authors(c: Column | str) -> Column:
    """D1: canonicalize an ``"First Last, Other Name"`` author list by
    sorting the tokens *within* each comma-separated name alphabetically.

    Native rewrite of reference src/cleaning.py:46-56. NULL propagates.
    """
    c = _col(c)
    names = F.split(c, ",")

    def canon(name: Column) -> Column:
        tokens = F.filter(F.split(name, " "), lambda t: t != F.lit(""))
        tokens = F.transform(tokens, _strip)
        return F.array_join(F.array_sort(tokens), " ")

    return F.array_join(F.transform(names, canon), ", ")


def remove_nums(c: Column | str) -> Column:
    """D2: strip all decimal digits (reference src/cleaning.py:59-63)."""
    return F.regexp_replace(_col(c), r"\d", "")


def clean_record(c: Column | str) -> Column:
    """D3: replace punctuation (commas preserved) with spaces, collapse
    runs of whitespace, strip (reference src/cleaning.py:66-73)."""
    c = _col(c)
    spaced = F.regexp_replace(c, _CLEAN_RECORD_RE, " ")
    collapsed = F.regexp_replace(spaced, r"[ \t\n\x0B\f\r]{2,}", " ")
    return _strip(collapsed)


@F.pandas_udf(StringType())
def _remove_accents_udf(s: pd.Series) -> pd.Series:
    import unicodedata

    def fold(x):
        if x is None:
            return None
        normalized = unicodedata.normalize("NFKD", x)
        return "".join(ch for ch in normalized if not unicodedata.combining(ch))

    return s.map(fold)


def remove_accents(c: Column | str) -> Column:
    """D4: NFKD-normalize and drop combining marks (é -> e).

    Reference src/cleaning.py:76-83. Spark has no NFKD builtin, so this is
    the engine's single pandas UDF on the clean path (Arrow-batched; apply
    it post-filter so it only sees surviving rows).
    """
    return _remove_accents_udf(_col(c))


def remove_stopwords(c: Column | str) -> Column:
    """D5: split on space or em-dash, drop NLTK English stopwords (matched
    on the RAW token), remove ALL double quotes (interior included —
    ``word.replace('"', "")`` in the reference), strip other punctuation/
    quote chars from token edges only, rejoin with single spaces
    (reference src/cleaning.py:86-98, bug-for-bug).

    The stopword list compiles to a literal array; the whole thing is one
    JVM-side expression.
    """
    c = _col(c)
    stop = F.lit(ENGLISH_STOPWORDS)
    tokens = F.split(c, " |—")
    kept = F.filter(tokens, lambda w: ~F.array_contains(stop, w))
    stripped = F.transform(
        kept,
        lambda w: F.regexp_replace(F.regexp_replace(w, '"', ""), _EDGE_STRIP_RE, ""),
    )
    joined = F.array_join(stripped, " ")
    return F.regexp_replace(joined, r"[ \t\n\x0B\f\r]{2,}", " ")


def get_num_authors(c: Column | str) -> Column:
    """D6: number of comma-separated authors; NULL -> 0, "" -> 1
    (reference src/cleaning.py:111-115)."""
    c = _col(c)
    return F.when(c.isNull(), F.lit(0)).otherwise(F.size(F.split(c, ",")))
