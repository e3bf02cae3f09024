"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD'03 — the MOSS algorithm).

Local document fingerprinting for near-verbatim overlap detection: hash
every character k-gram, slide a window of ``w`` consecutive k-gram
positions over the document, and select the minimal hash in each window.
The selected (position, hash) pairs are the document's fingerprints.
Guarantees (the paper's winnowing invariants):

- every verbatim match of length >= w + k - 1 characters between two
  documents is caught by at least one SHARED fingerprint, and
- expected selection density is 2 / (w + 1) of all k-gram positions,
  so the fingerprint set is a tunable-size sketch of the document.

This complements the repo's other text sketches: MinHash (set-level
similarity, ``operators/dedup.py``) answers "are these documents
similar overall", substring spans (``operators/substring_dedup.py``)
answers "which exact token runs repeat corpus-wide", while winnowing
answers "do these documents share any verbatim region" with a
guaranteed-coverage, position-addressed sketch — the plagiarism /
provenance primitive.

Spark-first design, mirroring the substring-dedup layout:

- the k-gram hash is ``md5`` (bit-identical in Spark and DuckDB, so the
  whole operator is oracle-checkable; xxhash64 would be ~2x cheaper but
  exists only on the Spark side),
- selection is ONE window-function pass — ``min`` of the (hash ||
  zero-padded position) key over a ``rowsBetween(0, w-1)`` frame,
  partitioned by document — so the only shuffle is the hash-partition
  by document id, identical in shape to the substring-dedup window
  stage that measured x37 at x100 data,
- the per-window tie-break is the POSITION suffix of the composite key:
  equal hashes resolve to the LEFTMOST position. The paper's "robust
  winnowing" breaks ties to the right; with a 128-bit hash over
  position-distinct grams, in-window hash ties are ~nonexistent and
  any FIXED tie-break preserves both invariants above. Leftmost is the
  one a plain ``min`` computes in both engines — deterministic and
  oracle-checkable, chosen deliberately (documented divergence).
- consecutive-window dedup is a ``lag`` over the SAME window spec
  (selections of one key form a consecutive run of window starts —
  if windows p and p' both select position q, every window between
  them contains q and selects it too, the composite key being
  tie-free) — so dedup costs no second shuffle and no ``distinct``.

The reference repo has no fingerprinting operator; this is part of the
LLM-training-data-pipeline surface (document fingerprinting / rolling
hash) built on the same documents table as the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hex digest length per hash function: the composite selection key is
# HASH || POS, split back apart at this boundary after selection
_HASH_LEN = {"md5": 32, "xx64": 16}
# zero-padded decimal position width. F.lpad TRUNCATES (not errors) past
# the pad width, which would corrupt the composite-key ordering — but a
# position needs > 10 digits only for a single document longer than
# 10 GB of normalized text, far past any per-row document this engine
# (or parquet row groups) would carry; pinned by the guard below.
_POS_PAD = 10
_MAX_DOC_LEN = 10**_POS_PAD - 1


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 8,
    hash: str = "md5",
    mode: str = "array",
) -> DataFrame:
    """Winnowed fingerprints per document: ``(id_col, fp_pos, fp_hash)``.

    ``fp_pos`` is the 1-based character position (in the
    whitespace-normalized text) of the selected k-gram, ``fp_hash`` its
    hex digest. ``hash`` picks the k-gram hash function: ``"md5"``
    (default — bit-identical in DuckDB, so the operator stays
    oracle-checkable) or ``"xx64"`` (xxhash64, the production fast
    path: ~half the per-gram hash cost, Spark-side only). Both paths
    run the IDENTICAL plan — only the hash expression differs — and
    both satisfy the winnowing invariants, which hold under ANY fixed
    total order on hashes; the selected POSITION SETS differ between
    hash functions (different hashes, different in-window minima),
    which is inherent to the algorithm, not a defect. Text is
    normalized exactly like :func:`..functions.text.fingerprint_md5`
    (trim + collapse whitespace) so fingerprints are
    layout-invariant. Documents shorter
    than ``k`` contribute their single truncated gram (the
    :func:`char_shingles` convention); documents with fewer than ``w``
    k-gram positions yield the minimum over all their positions (one
    shrunk window), so every non-degenerate document has >= 1
    fingerprint.

    Documents whose normalized text is EMPTY (all-whitespace or NULL)
    emit NO fingerprints: every empty document would otherwise carry
    the same md5('') fingerprint, and any 2..max_df of them would then
    surface as verbatim-overlap "pairs" sharing zero content — real
    corpora routinely contain empty documents after cleaning, so the
    operator excludes them rather than asking every caller to.
    Documents whose normalized text exceeds ``_MAX_DOC_LEN`` (1e10-1
    chars) are likewise excluded — they emit NO fingerprints rather
    than corrupted composite keys. This bound is unreachable in
    practice: a Spark string column caps at ~2.1e9 bytes
    (Integer.MAX_VALUE), roughly 5x below the guard, so
    no representable row can trip it; the filter exists to pin the
    lpad-truncation assumption rather than to handle a live case.

    Plan shape (``mode="array"``, the default, r11): the whole
    selection is PER-DOCUMENT-LOCAL, so it runs as array expressions
    inside one projection pipeline — build the (hash, pos) key per
    k-gram position with ``transform`` over ``sequence``, take each
    full window's minimum with ``least`` over ``w`` O(1) ``get`` s,
    dedup consecutive equal selections with an indexed ``filter``, and
    only then ``explode`` the ~2/(w+1)-density survivors. ZERO
    shuffles, zero sorts, no UDFs, no distinct — where the legacy
    ``mode="window"`` shape exploded one row per POSITION through a
    hash-partition Exchange + per-document Sort just to run the same
    O(n*w) sliding min as window functions. Removing that exchange is
    a guide-§2.4 structural win: at 100 TB it was a full shuffle of
    ~(42 + id) bytes per text CHARACTER. The composite key is
    ``struct(h, p)`` whose min is lexicographic (hash, pos) — the
    identical total order the window path's ``h || lpad(pos)`` string
    key induces, so both modes select the same fingerprints (pinned by
    ``test_winnowing.py::test_array_mode_equals_window_mode``).
    Per-row transient memory is O(len(text)) structs; callers with
    pathological multi-GB single rows can fall back to
    ``mode="window"``, which streams positions through the shuffle
    instead.
    """
    from ..functions.text import WS_CLASS

    if hash not in _HASH_LEN:
        raise ValueError(f"hash must be one of {sorted(_HASH_LEN)}, got {hash!r}")
    if mode not in ("array", "window"):
        raise ValueError(f"mode must be 'array' or 'window', got {mode!r}")
    txt = F.trim(
        F.regexp_replace(
            F.coalesce(F.col(text_col), F.lit("")), WS_CLASS + "+", " "
        )
    )
    if mode == "array":
        return _winnow_array(df, id_col, txt, k, w, hash)
    n_pos = F.greatest(F.lit(1), F.length(txt) - F.lit(k - 1))
    gram = F.col("__txt").substr(F.col("pos"), F.lit(k))
    if hash == "md5":
        gram_hash = F.md5(gram)
    else:
        # hex of the two's-complement long, lpad-normalized to 16 chars:
        # a fixed-width string whose lexicographic order is a fixed
        # total order on hash values — all winnowing needs
        gram_hash = F.lpad(F.hex(F.xxhash64(gram)), _HASH_LEN["xx64"], "0")
    grams = df.filter(
        (F.length(txt) > 0) & (F.length(txt) <= _MAX_DOC_LEN)
    ).select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), n_pos)).alias("pos"),
        n_pos.alias("__np"),
        txt.alias("__txt"),
    ).select(
        id_col,
        "pos",
        "__np",
        F.concat(
            gram_hash,
            F.lpad(F.col("pos").cast("string"), _POS_PAD, "0"),
        ).alias("__key"),
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    sel = (
        grams.withColumn("__sel", F.min("__key").over(win.rowsBetween(0, w - 1)))
        # full windows only (every other frame is a suffix of a full
        # window and selects a key some full window already selected) —
        # EXCEPT when the whole document has fewer than w positions, in
        # which case the one shrunk window at pos=1 is the algorithm
        .filter(
            F.col("pos") <= F.greatest(F.lit(1), F.col("__np") - F.lit(w - 1))
        )
        .withColumn("__prev", F.lag("__sel").over(win))
        .filter(F.col("__prev").isNull() | (F.col("__sel") != F.col("__prev")))
    )
    hlen = _HASH_LEN[hash]
    return sel.select(
        id_col,
        F.substring("__sel", hlen + 1, _POS_PAD).cast("bigint").alias("fp_pos"),
        F.substring("__sel", 1, hlen).alias("fp_hash"),
    )


def _winnow_array(
    df: DataFrame, id_col: str, txt, k: int, w: int, hash: str
) -> DataFrame:
    """Shuffle-free winnowing: the sliding-min selection and the
    consecutive-run dedup both live entirely inside one document row,
    so they run as array expressions — no Exchange, no Sort.

    Stage layout (three projections, each alias referenced several
    times downstream so CollapseProject provably cannot re-inline the
    expensive expression into every consumer — the same staging rule
    as substring dedup's token barrier):

    1. ``__keys``: one ``struct(h, p)`` per k-gram position (the hash
       is computed ONCE per position here),
    2. ``__sel``: per full window ``i``, ``least`` over the ``w``
       members ``get(__keys, i-1+j)`` — ``get`` is O(1) and returns
       NULL past the array end, which ``least`` skips, so the one
       shrunk window of a short document (n_pos < w) falls out of the
       same expression,
    3. keep ``__sel[i]`` where ``i == 0`` or it differs from
       ``__sel[i-1]`` (selections of one key form one consecutive run;
       see the module docstring), then explode survivors only.
    """
    if hash == "md5":
        def gram_hash(g):
            return F.md5(g)
    else:
        def gram_hash(g):
            return F.lpad(F.hex(F.xxhash64(g)), _HASH_LEN["xx64"], "0")

    n_pos = F.greatest(F.lit(1), F.length("__txt") - F.lit(k - 1))
    keys = F.transform(
        F.sequence(F.lit(1), n_pos),
        lambda p: F.struct(
            gram_hash(F.col("__txt").substr(p, F.lit(k))).alias("h"),
            p.alias("p"),
        ),
    )
    staged = df.filter(
        (F.length(txt) > 0) & (F.length(txt) <= _MAX_DOC_LEN)
    ).select(F.col(id_col), txt.alias("__txt"))
    keyed = staged.select(id_col, keys.alias("__keys"))
    # number of FULL windows (one shrunk window when the doc is short)
    n_sel = F.greatest(F.lit(1), F.size(F.col("__keys")) - F.lit(w - 1))
    if w == 1:
        sel = F.col("__keys")
    else:
        sel = F.transform(
            F.sequence(F.lit(1), n_sel),
            lambda i: F.least(
                *[F.get(F.col("__keys"), i + F.lit(j - 1)) for j in range(w)]
            ),
        )
    selected = keyed.select(id_col, sel.alias("__sel"))
    # consecutive dedup: get(sel, i-1) is NULL exactly at i == 0 (the
    # first element, always kept); sel elements themselves are never
    # NULL, so the isNull test is unambiguous
    prev = lambda i: F.get(F.col("__sel"), i - F.lit(1))  # noqa: E731
    uniq = F.filter(
        F.col("__sel"), lambda x, i: prev(i).isNull() | (x != prev(i))
    )
    return selected.select(id_col, F.explode(uniq).alias("__fp")).select(
        id_col,
        F.col("__fp.p").cast("bigint").alias("fp_pos"),
        F.col("__fp.h").alias("fp_hash"),
    )


def fingerprint_overlap_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int = 10,
    min_shared: int = 1,
) -> DataFrame:
    """Candidate verbatim-overlap pairs from a winnowed fingerprint set:
    ``(a_id, b_id, n_shared)`` — documents sharing >= ``min_shared``
    distinct fingerprint hashes, counted over hashes whose document
    frequency lies in ``[min_df, max_df]``.

    The ``max_df`` cap is the standard common-gram suppression (MOSS
    drops over-shared fingerprints the same way): a hash appearing in
    thousands of documents signals boilerplate, not provenance, and —
    the scale reason — it BOUNDS the equi-join's per-bucket fan-out at
    C(max_df, 2) pairs per hash, keeping the candidate join linear in
    corpus size instead of quadratic in the hottest bucket. Never an
    all-pairs comparison: one groupBy for document frequency, one
    self-equi-join on the hash, one pair aggregation.
    """
    # a document may select the same gram hash at several positions;
    # presence is what pairs care about
    present = fps.select(id_col, "fp_hash").distinct()
    dfreq = (
        present.groupBy("fp_hash")
        .agg(F.count("*").alias("__df"))
        .filter((F.col("__df") >= min_df) & (F.col("__df") <= max_df))
        .select("fp_hash")
    )
    keyed = present.join(dfreq, "fp_hash")
    a = keyed.select(F.col("fp_hash"), F.col(id_col).alias("a_id"))
    b = keyed.select(F.col("fp_hash"), F.col(id_col).alias("b_id"))
    return (
        a.join(b, "fp_hash")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        # `present` is distinct per (doc, hash), so each shared hash
        # contributes exactly one joined row per pair
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
