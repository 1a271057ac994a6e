"""One cross-engine contract for "JSON text → integer".

Spark's ``try_cast(string AS BIGINT)`` REJECTS fractional and
scientific text ('0.5', '1e2' → NULL) while DuckDB's ``TRY_CAST``
parses and ROUNDS them ('0.5' → 1, '2.5' → 3, '1e2' → 100) — so every
query that extracts a JSON field as text and casts it to an integer
silently diverged on dirty payloads carrying non-integer numbers
(r11 fuzz seeds 15/17/19). The contract here: a JSON-extracted value
converts to an integer IFF its text is a pure optionally-signed digit
string (leading zeros fine, whitespace/sign-plus/decimal/exponent
rejected); everything else is NULL. Out-of-int64 digit strings
TRY_CAST to NULL identically in both engines.

Both spellings share :data:`INT_TEXT_RE` so the accepted language
can't drift per engine.

Anchors are ``\\A``/``\\z``, not ``^``/``$``: Java regex (Spark RLIKE)
lets ``$`` match BEFORE a trailing newline while RE2 (DuckDB) pins it
to end-of-text — so a payload value of ``'123\\n'`` passed Spark's
guard (and Spark's integer cast trims whitespace → 123) while DuckDB
rejected it (r11 review, verified live). ``\\A``/``\\z`` mean
end-of-text in BOTH engines.
"""

from __future__ import annotations

INT_TEXT_RE = r"\A-?[0-9]+\z"


def _sql_escape(regex: str) -> str:
    """Escape a regex for a Spark SQL single-quoted literal (backslash-
    escaped by default; DuckDB literals pass through verbatim)."""
    return regex.replace("\\", "\\\\")

# Trailing-fractional-zeros strip for CANONICALIZED numeric text (the
# variant path): Spark's VARIANT renders JSON decimals canonically
# ('1.0' → '1', '-0.0' → '0', '1e2' → '100.0') while DuckDB's
# json_extract_string keeps one fractional digit ('1.0', '-0.0',
# '100.0') — stripping '\\.0+$' on BOTH sides makes every
# integral-valued decimal convert identically, and '-0' TRY_CASTs to 0
# identically so no sign special-case is needed. Non-integral and
# exponent forms keep failing the regex in both engines.
_STRIP_RE = r"\.0+\z"  # one regex; engine-specific literal escaping below


def int_text_spark(
    expr: str, out_type: str = "BIGINT", *, canon: bool = False
) -> str:
    """Spark SQL: guarded integer conversion of a string expression."""
    if canon:
        # Spark SQL string literals are backslash-ESCAPED (default
        # escapedStringLiterals=false): '\\.' in the SQL text reaches
        # the regex engine as '\.'; a single backslash would strip any
        # trailing character before zeros (r11 — collapsed '100'→'1')
        expr = f"regexp_replace({expr}, '{_sql_escape(_STRIP_RE)}', '')"
    return (
        f"CASE WHEN {expr} RLIKE '{_sql_escape(INT_TEXT_RE)}'"
        f" THEN try_cast({expr} AS {out_type}) END"
    )


def int_text_duck(
    expr: str, out_type: str = "BIGINT", *, canon: bool = False
) -> str:
    """DuckDB SQL: the same guarded conversion."""
    if canon:
        # DuckDB string literals are SQL-standard (no backslash
        # escaping): the literal carries '\.' through verbatim
        expr = f"regexp_replace({expr}, '{_STRIP_RE}', '')"
    return (
        f"CASE WHEN regexp_matches({expr}, '{INT_TEXT_RE}')"
        f" THEN TRY_CAST({expr} AS {out_type}) END"
    )
