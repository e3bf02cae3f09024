"""Plain-Python oracles for the reference's cleaning UDF semantics.

These are independent reimplementations of the behaviors documented in
SURVEY.md §2.7 (reference src/cleaning.py:46-115) used ONLY as test
oracles for the engine's native Column expressions. Each mirrors the
documented semantics including the quirks (pre-strip stopword match,
filter-before-strip token handling, NULL -> 0 author count).
"""

from __future__ import annotations

import re
import string
import unicodedata

from pyspark_entity_resolution_spark.functions.stopwords import STOPWORD_SET

QUOTES = "\"“'’″`“”"
CLEAN_CHARS = r'!"$%&\'()’:;+.<=>?″`“”/-@[\\]#{|}'


def oracle_sort_authors(s: str | None) -> str | None:
    if s is None:
        return None
    out = []
    for name in s.split(","):
        tokens = sorted(t.strip() for t in name.split(" ") if t)
        out.append(" ".join(tokens))
    return ", ".join(out)


def oracle_remove_nums(s: str | None) -> str | None:
    if s is None:
        return None
    return re.sub(r"\d", "", s)


def oracle_clean_record(s: str | None) -> str | None:
    if s is None:
        return None
    spaced = re.sub("[" + re.escape(CLEAN_CHARS) + "]", " ", s)
    return re.sub(r"\s{2,}", " ", spaced).strip()


def oracle_remove_accents(s: str | None) -> str | None:
    if s is None:
        return None
    norm = unicodedata.normalize("NFKD", s)
    return "".join(ch for ch in norm if not unicodedata.combining(ch))


def oracle_remove_stopwords(s: str | None) -> str | None:
    if s is None:
        return None
    kept = [
        w.replace('"', "").strip(string.punctuation + QUOTES + " ")
        for w in re.split(" |—", s)
        if w not in STOPWORD_SET
    ]
    return re.sub(r"\s{2,}", " ", " ".join(kept))


def oracle_num_authors(s: str | None) -> int:
    if s is None:
        return 0
    return len(s.split(","))
