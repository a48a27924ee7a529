"""PII detection and redaction over text columns.

A standard stage of web-scale training-data pipelines (C4, RefinedWeb,
Dolma all scrub emails/phones/IP addresses before training). Everything
here is pure JVM codegen — ``regexp_count`` / ``regexp_replace`` column
expressions, no UDFs, no shuffle — so the stage is a narrow map over the
corpus and scales to 100 TB as a single scan fused with whatever filter
or projection surrounds it.

Pattern notes: the regexes deliberately use only syntax shared by Java's
regex engine (Spark) and RE2 (DuckDB — the oracle engine): character
classes, bounded repetition, non-capturing groups, ``\\b`` word
boundaries. No lookarounds, no backreferences — RE2 rejects them, and
they would also defeat regex vectorization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Detection patterns, keyed by kind. Conservative on purpose: a
# training-data scrub prefers a few false positives (redacting a
# not-quite-email) over leaking real contact strings into a model.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — tld at least 2 alpha chars
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NANP-style 555-123-4567 (also dots/spaces as separators)
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    # dotted-quad IPv4 (syntactic — octet range filtering would need
    # alternations that differ between engines for no detection gain)
    "ipv4": r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b",
    # US SSN shape 123-45-6789
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # 16-digit payment-card shape, optional -/space group separators
    # (round 11); Luhn checksum validation is a separate expression —
    # see luhn_ok / cc_valid_count — because a scrub REDACTS on shape
    # (conservative) but REPORTS validated counts (a leak of real card
    # numbers is a different severity than 16 digits that happen to
    # line up)
    "cc": r"\b(?:\d{4}[- ]?){3}\d{4}\b",
}

# Redaction order matters: ssn/phone shapes can overlap ipv4-adjacent
# digit runs, and email must go first so its digits are not partially
# eaten by the numeric patterns; cc precedes phone/ssn so a card's
# 4-digit groups are not partially consumed.
REDACT_ORDER = ("email", "cc", "phone", "ssn", "ipv4")


def pii_counts(df: DataFrame, text_col: str = "text",
               kinds: tuple[str, ...] | None = None,
               prefix: str = "n_") -> DataFrame:
    """Per-row match counts, one int column per kind (``n_email``, ...).

    NULL text counts as 0 of everything (regexp_count would
    NULL-propagate, and a NULL count silently escapes downstream
    ``n_email == 0`` clean-doc filters). Redaction keeps NULL as NULL —
    there is nothing to redact.

    One codegen'd projection — the regex automata run inside the same
    whole-stage pipeline as the scan, so at 100 TB this costs exactly
    one pass that Catalyst fuses with downstream filters.
    """
    out = df
    for kind in kinds or PII_PATTERNS:
        out = out.withColumn(
            f"{prefix}{kind}",
            F.coalesce(
                F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[kind])),
                F.lit(0),
            ),
        )
    return out


def _java_replacement(token: str) -> str:
    """Escape a literal replacement for Java's replaceAll semantics:
    bare ``$`` is a group reference (token='$100' would throw
    INVALID_REGEXP_REPLACE at runtime) and ``\\`` an escape."""
    return token.replace("\\", "\\\\").replace("$", "\\$")


def _re2_replacement(token: str) -> str:
    """Escape a literal replacement for RE2 (DuckDB) semantics: only
    ``\\`` is special (group refs are ``\\1``; ``$`` is literal — and
    escaping it would be an RE2 rewrite ERROR, so the two engines need
    different escapes)."""
    return token.replace("\\", "\\\\")


def redact(df: DataFrame, text_col: str = "text", out_col: str | None = None,
           kinds: tuple[str, ...] = REDACT_ORDER, token: str = "<pii>") -> DataFrame:
    """Replace every PII match with ``token`` (chained global
    regexp_replace — Spark's regexp_replace replaces ALL matches)."""
    expr = F.col(text_col)
    rep = _java_replacement(token)
    for kind in kinds:
        expr = F.regexp_replace(expr, PII_PATTERNS[kind], rep)
    return df.withColumn(out_col or text_col, expr)


def redact_sql(text_expr: str, kinds: tuple[str, ...] = REDACT_ORDER,
               token: str = "<pii>") -> str:
    """DuckDB twin of :func:`redact` for oracle SQL: same patterns, same
    order; DuckDB needs the explicit ``'g'`` flag for replace-all."""
    expr = text_expr
    rep = _re2_replacement(token).replace("'", "''")
    for kind in kinds:
        pat = PII_PATTERNS[kind].replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


def count_sql(text_expr: str, kind: str) -> str:
    """DuckDB twin of one :func:`pii_counts` column."""
    pat = PII_PATTERNS[kind].replace("'", "''")
    return f"COALESCE(len(regexp_extract_all({text_expr}, '{pat}')), 0)"


def luhn_ok(s: F.Column) -> F.Column:
    """Luhn checksum over a digit-only string Column (ISO/IEC 7812):
    doubling every second digit from the right, folding >9 to d−9,
    valid iff the sum ≡ 0 (mod 10). Pure codegen — one in-row
    transform+aggregate over the digit positions, no UDF."""
    n = F.length(s)
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i % 2 == 0,
            F.when(
                (F.ascii(s.substr(n - i + 1, F.lit(1))) - 48) * 2 > 9,
                (F.ascii(s.substr(n - i + 1, F.lit(1))) - 48) * 2 - 9,
            ).otherwise((F.ascii(s.substr(n - i + 1, F.lit(1))) - 48) * 2),
        ).otherwise(F.ascii(s.substr(n - i + 1, F.lit(1))) - 48),
    )
    return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 10 == 0


def cc_valid_count(df: DataFrame, text_col: str = "text",
                   out_col: str = "n_cc_valid") -> DataFrame:
    """Count of card-SHAPED matches that also pass the Luhn checksum:
    extract matches, strip separators in-row, filter by luhn_ok — all
    codegen, zero shuffle. NULL text counts 0 (the pii_counts
    convention)."""
    ms = F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS["cc"]), 0)
    cleaned = F.transform(ms, lambda m: F.regexp_replace(m, r"[- ]", ""))
    valid = F.filter(cleaned, lambda c: (F.length(c) == 16) & luhn_ok(c))
    return df.withColumn(out_col, F.coalesce(F.size(valid), F.lit(0)))


def cc_valid_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`cc_valid_count`: the same extract → strip
    → Luhn chain over list functions (1-based char indexing; i counts
    from the right, so the char index is 17−i for a 16-digit string)."""
    pat = PII_PATTERNS["cc"].replace("'", "''")
    digit = "(ascii(c[17 - i]) - 48)"
    term = (
        f"CASE WHEN i % 2 = 0 THEN "
        f"CASE WHEN {digit} * 2 > 9 THEN {digit} * 2 - 9 ELSE {digit} * 2 END "
        f"ELSE {digit} END"
    )
    return (
        "COALESCE(len(list_filter(list_transform("
        f"regexp_extract_all({text_expr}, '{pat}'), "
        "m -> regexp_replace(m, '[- ]', '', 'g')), "
        f"c -> len(c) = 16 AND "
        f"list_sum(list_transform(range(1, 17), i -> {term})) % 10 = 0)), 0)"
    )
