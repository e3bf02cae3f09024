"""Deterministic entity-resolution fixture + independent Python oracle.

Builds two AMiner-format text dumps with planted cross-dataset duplicates
exercising every match-rule band, near-misses, and transitive chains — then
computes the expected matched-pair set with a brute-force plain-Python
implementation of the documented reference semantics (cleaning, venue
agreement, Levenshtein band, Jaccard threshold, optional rolling-window
blocking). Tests compare the Spark engine's output against this oracle.
"""

from __future__ import annotations

import random
import re

from pyspark_entity_resolution_spark.sources.aminer import format_aminer_record

from .reference_semantics import (
    oracle_clean_record,
    oracle_num_authors,
    oracle_remove_accents,
    oracle_remove_nums,
    oracle_remove_stopwords,
    oracle_sort_authors,
)

FIRST = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]
LAST = ["smith", "jones", "chen", "garcia", "müller", "dubois", "kim", "patel"]
WORDS = [
    "efficient", "query", "processing", "distributed", "systems", "index",
    "join", "optimization", "streaming", "graphs", "transactions", "storage",
    "adaptive", "parallel", "learning", "approximate",
]

VENUES = ["sigmod", "vldb"]
YEAR_LO, YEAR_HI = 1995, 2004


def _title(rng: random.Random) -> str:
    return " ".join(rng.sample(WORDS, 5))


def _authors(rng: random.Random, n: int) -> str:
    return ", ".join(f"{rng.choice(FIRST)} {rng.choice(LAST)}" for _ in range(n))


def make_fixture(seed: int = 7, n_background: int = 60):
    """Return (records_a, records_b): lists of dicts with keys
    title/authors/year/venue/index."""
    rng = random.Random(seed)
    recs_a: list[dict] = []
    recs_b: list[dict] = []
    next_id = [0]

    def fresh(prefix):
        next_id[0] += 1
        return f"{prefix}{next_id[0]:04d}"

    def add(side, title, authors, year, venue):
        rec = {
            "title": title,
            "authors": authors,
            "year": year,
            "venue": venue,
            "index": fresh(side),
        }
        (recs_a if side == "a" else recs_b).append(rec)
        return rec["index"]

    # cond1: identical authors (score 0), same non-zero count
    for i in range(8):
        year = 1995 + (i % 9)
        venue_a = "SIGMOD Conference" if i % 2 == 0 else "VLDB"
        venue_b = "Proceedings of SIGMOD" if i % 2 == 0 else "VLDB Journal"
        title = _title(rng)
        authors = _authors(rng, 2 + i % 3)
        add("a", title, authors, year, venue_a)
        add("b", title, authors, year, venue_b)

    # empty-string authors: num_authors("") == 1, matches via cond1
    for i in range(3):
        title = _title(rng)
        add("a", title, "", 1996 + i, "VLDB")
        add("b", title, "", 1996 + i, "VLDB Journal")

    # cond3: trailing-char author typo (levenshtein 1), same count
    for i in range(6):
        year = 1997 + (i % 7)
        title = _title(rng)
        authors = _authors(rng, 2)
        typo = authors[:-1] + ("x" if authors[-1] != "x" else "y")
        add("a", title, authors, year, "SIGMOD Conference")
        add("b", title, typo, year, "Proceedings of SIGMOD")

    # transitive chain / fan-out -> one 4-node cluster
    title = _title(rng)
    authors = _authors(rng, 3)
    add("a", title, authors, 2000, "SIGMOD Conference")
    add("a", title, authors, 2000, "SIGMOD Conference and Workshops")
    add("b", title, authors, 2000, "Proceedings of SIGMOD")
    add("b", title, authors, 2001, "SIGMOD Record")

    # near-misses
    t = _title(rng)
    add("a", t, "alice smith, bob jones", 1999, "VLDB")
    add("b", t, "zzzzzzz qqqqqqq, ppppp wwwww", 1999, "VLDB Journal")
    t = _title(rng)
    add("a", t, "carol chen", 2001, "VLDB")
    add("b", t, "carol chen, dave kim", 2001, "VLDB Journal")
    authors = _authors(rng, 2)
    add("a", "alpha beta gamma delta epsilon", authors, 2002, "VLDB")
    add("b", "zeta eta theta iota kappa", authors, 2002, "VLDB Journal")
    t = _title(rng)
    authors = _authors(rng, 2)
    add("a", t, authors, 1990, "VLDB")
    add("b", t, authors, 1990, "VLDB Journal")
    t = _title(rng)
    authors = _authors(rng, 2)
    add("a", t, authors, 2003, "SIGMOD Conference")
    add("b", t, authors, 2003, "VLDB Journal")

    # background noise dropped at prepare (decoy venue or year)
    for i in range(n_background):
        side = "a" if i % 2 == 0 else "b"
        if i % 3 == 0:
            venue = rng.choice(["VLDB", "SIGMOD Conference"])
            year = rng.choice([1985, 1991, 2010])
        else:
            venue = rng.choice(["ICDE", "KDD", "CIKM", "WWW"])
            year = rng.choice([1996, 1999, 2003])
        add(side, _title(rng), _authors(rng, 1 + i % 4), year, venue)

    # survive-the-filter noise with far-apart random author strings
    letters = "abcdefghijklmnopqrstuvwxyz"
    for i in range(10):
        side = "a" if i % 2 == 0 else "b"
        name = "".join(rng.choice(letters) for _ in range(12))
        surname = "".join(rng.choice(letters) for _ in range(12))
        venue = "VLDB" if side == "a" else "VLDB Journal"
        add(side, _title(rng), f"{name} {surname}", 1995 + i % 10, venue)

    rng.shuffle(recs_a)
    rng.shuffle(recs_b)
    return recs_a, recs_b


# ---------------------------------------------------------------- oracle --

def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def oracle_clean(rec: dict) -> dict | None:
    """Prepare-stage oracle: parse-lowering + year/venue filter + cleaning."""
    title = rec["title"].lower().strip()
    authors = rec["authors"].lower().strip() if rec["authors"] is not None else None
    venue = rec["venue"].lower().strip()
    year = rec["year"]
    if not (YEAR_LO <= year <= YEAR_HI):
        return None
    if not any(v in venue for v in VENUES):
        return None
    clean_title = oracle_remove_stopwords(oracle_remove_accents(title))
    clean_authors = (
        oracle_sort_authors(
            oracle_remove_accents(oracle_clean_record(oracle_remove_nums(authors)))
        )
        if authors is not None
        else None
    )
    return {
        "index": rec["index"],
        "title": clean_title,
        "authors": clean_authors,
        "num_authors": oracle_num_authors(clean_authors),
        "year": year,
        "venue": oracle_clean_record(venue),
    }


def _jaccard(t1: str, t2: str) -> float:
    s1 = set(re.split(r"\s+", t1))
    s2 = set(re.split(r"\s+", t2))
    return len(s1 & s2) / len(s1 | s2)


def _pair_matches(a: dict, b: dict) -> bool:
    same_venue = any(v in a["venue"] and v in b["venue"] for v in VENUES)
    if not same_venue:
        return False
    if a["authors"] is None or b["authors"] is None:
        return False  # NULL score is dropped by the band filter
    score = _levenshtein(a["authors"], b["authors"])
    if not (0 <= score < 10):
        return False
    na, nb = a["num_authors"], b["num_authors"]
    cond1 = score == 0 and na == nb and na > 0 and nb > 0
    cond2 = score == 0 and na == 0 and nb == 0
    cond3 = 0 < score < 10 and na == nb
    if not (cond1 or cond2 or cond3):
        return False
    return _jaccard(a["title"], b["title"]) >= 0.6


def _windows(year: int, window: int) -> set[int]:
    lo = max(YEAR_LO, year - window)
    hi = min(YEAR_HI - window, year)
    return set(range(lo, hi + 1))


def _blocked_together(a: dict, b: dict, window: int) -> bool:
    for v in VENUES:
        if v in a["venue"] and v in b["venue"]:
            if _windows(a["year"], window) & _windows(b["year"], window):
                return True
    return False


def oracle_matches(recs_a, recs_b, window: int | None):
    """Brute-force expected matched-pair set {(a_index, b_index)}."""
    ca = [c for c in (oracle_clean(r) for r in recs_a) if c]
    cb = [c for c in (oracle_clean(r) for r in recs_b) if c]
    out = set()
    for a in ca:
        for b in cb:
            if window is not None and not _blocked_together(a, b, window):
                continue
            if _pair_matches(a, b):
                out.add((a["index"], b["index"]))
    return out


def write_fixture(tmpdir: str, seed: int = 7):
    import os

    recs_a, recs_b = make_fixture(seed)
    path_a = os.path.join(tmpdir, "dump_a.txt")
    path_b = os.path.join(tmpdir, "dump_b.txt")
    for path, recs in [(path_a, recs_a), (path_b, recs_b)]:
        with open(path, "w") as f:
            f.write(
                "\n\n".join(
                    format_aminer_record(
                        r["title"], r["authors"], r["year"], r["venue"], r["index"]
                    )
                    for r in recs
                )
            )
    return path_a, path_b, recs_a, recs_b
