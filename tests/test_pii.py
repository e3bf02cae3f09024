"""PII detection/redaction unit tests (functions/pii.py)."""

from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.functions import pii as P


def _one(spark, text: str):
    return spark.createDataFrame([(text,)], "text string")


def test_counts_per_kind(spark):
    text = (
        "mail a@b.io and c.d+e@sub.example.co.uk, call +44 207 946-0958 "
        "or 1-555-0199, host 192.168.0.1, card 4111111111111111 done"
    )
    row = (
        _one(spark, text)
        .select(
            P.pii_count("text", "email").alias("e"),
            P.pii_count("text", "phone").alias("p"),
            P.pii_count("text", "ipv4").alias("i"),
            P.pii_count("text", "card").alias("c"),
        )
        .first()
    )
    assert (row.e, row.p, row.i, row.c) == (2, 2, 1, 1)


def test_redaction_masks_everything(spark):
    text = "u@x.org then +1-555-0100 then 10.0.0.1 then 4111111111111111"
    red = _one(spark, text).select(P.redact_pii("text").alias("r")).first().r
    assert red == "[EMAIL] then [PHONE] then [IP] then [CARD]"


def test_card_not_eaten_as_phone(spark):
    # 16-digit runs must redact as [CARD]; phone needs separators
    red = (
        _one(spark, "pay 5500005555555559 now")
        .select(P.redact_pii("text").alias("r"))
        .first()
        .r
    )
    assert red == "pay [CARD] now"


def test_ip_not_eaten_as_phone(spark):
    # 3-digit IPv4 segments must survive phone redaction intact
    red = (
        _one(spark, "node 110.123.234.245 up")
        .select(P.redact_pii("text").alias("r"))
        .first()
        .r
    )
    assert red == "node [IP] up"


def test_paren_area_code_redacts(spark):
    for text, want in [
        ("call (555) 123-4567 today", "call [PHONE] today"),
        ("call (555)123-4567 today", "call [PHONE] today"),
        ("call (555) 123 4567 today", "call [PHONE] today"),
    ]:
        red = _one(spark, text).select(P.redact_pii("text").alias("r")).first().r
        assert red == want, text
    n = (
        _one(spark, "(212) 867-5309 and (415) 555 0100")
        .select(P.pii_count("text", "phone").alias("p"))
        .first()
        .p
    )
    assert n == 2


def test_unseparated_international_redacts(spark):
    red = (
        _one(spark, "reach +14155551234 or +442079460958 now")
        .select(P.redact_pii("text").alias("r"))
        .first()
        .r
    )
    assert red == "reach [PHONE] or [PHONE] now"
    # bare digit runs WITHOUT the '+' context stay untouched (no
    # license to redact an arbitrary 10-digit number)
    text = "order 4155551234 confirmed"
    red2 = _one(spark, text).select(P.redact_pii("text").alias("r")).first().r
    assert red2 == text
    # a '+'-prefixed 16-digit run is card-sized: the earlier card
    # pattern takes it, leaving the '+' (documented precedence)
    red3 = (
        _one(spark, "pay +4111111111111111 now")
        .select(P.redact_pii("text").alias("r"))
        .first()
        .r
    )
    assert red3 == "pay +[CARD] now"


def test_clean_text_untouched(spark):
    text = "no pii here just words and the number 42"
    out = (
        _one(spark, text)
        .select(
            P.redact_pii("text").alias("r"),
            P.pii_counts_struct("text").alias("s"),
        )
        .first()
    )
    assert out.r == text
    assert (out.s.n_email, out.s.n_card, out.s.n_phone, out.s.n_ipv4) == (0, 0, 0, 0)


def test_no_python_boundary(spark):
    # the scrub pass must ride the scan: no Python eval node in the plan
    df = _one(spark, "x").select(P.redact_pii("text"), P.pii_counts_struct("text"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_randomized_pii_injection_always_masked(spark):
    """Seeded random word-soup with PII snippets injected at random
    positions: redaction must remove every raw occurrence, and
    PII-free text must pass through byte-identical."""
    import random

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    snippets = {
        "email": "probe@example.net",
        "phone": "+1-555-0147",
        "phone_paren": "(415) 555-0147",
        "phone_intl": "+442079460958",
        "ipv4": "192.168.7.9",
        "card": "4111111111111111",
    }
    for seed in range(8):
        rng = random.Random(seed)
        clean = " ".join(rng.choice(words) for _ in range(rng.randint(5, 30)))
        kind = rng.choice(list(snippets))
        toks = clean.split()
        toks.insert(rng.randint(0, len(toks)), snippets[kind])
        dirty = " ".join(toks)
        rows = spark.createDataFrame(
            [(0, clean), (1, dirty)], "i long, text string"
        ).select("i", P.redact_pii("text").alias("r")).collect()
        by_id = {r.i: r.r for r in rows}
        assert by_id[0] == clean, f"seed {seed}: clean text altered"
        assert snippets[kind] not in by_id[1], f"seed {seed}: raw PII survived"
        assert "[" in by_id[1], f"seed {seed}: no tag emitted"
