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
}

# Redaction order matters: ssn/phone shapes can overlap ipv4-adjacent
# digit runs, and email must go first so its digits are not partially
# eaten by the numeric patterns.
REDACT_ORDER = ("email", "phone", "ssn", "ipv4")


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
