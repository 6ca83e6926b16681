"""Canonical scalar text functions — the single source of truth for the
normalization / footnote / boilerplate semantics.

Everything here is a *built-in Spark SQL expression builder* (JVM-side,
whole-stage-codegen friendly — never a Python UDF). The regex constants are
module-level so the pure-Python test oracle and the DuckDB oracle SQL can
reuse the exact same patterns.

Semantics are frozen from the reference (cited per function); where the
reference has two divergent helper copies (SURVEY.md §7.3.5) the
``textract_processor.py`` variant is canonical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- normalization (reference: textract_processor.py:162-184) -------------
# order matters and is frozen:
#   1. strip Unicode superscript digits
#   2. strip footnote-ref patterns (1) / [2] / *** in-place
#   3. collapse whitespace + trim
#   4. a line that is now a standalone number becomes '' (the reference's
#      '^\d+$' rule at textract_processor.py:175, applied post-collapse here
#      so ' 12 ' is also caught)
SUPERSCRIPT_RE = "[⁰¹²³⁴⁵⁶⁷⁸⁹]+"
PAREN_NUM_RE = r"\(\d+\)"
BRACKET_NUM_RE = r"\[\d+\]"
STARS_RE = r"\*+"
WS_RE = r"\s+"
STANDALONE_NUM_RE = r"^\d+$"


def normalize_text_col(col: Column) -> Column:
    """Superscript/footnote-marker strip + whitespace collapse.

    Mirrors ``_remove_superscript_numbers`` (textract_processor.py:162-184).
    """
    c = F.regexp_replace(col, SUPERSCRIPT_RE, "")
    c = F.regexp_replace(c, PAREN_NUM_RE, "")
    c = F.regexp_replace(c, BRACKET_NUM_RE, "")
    c = F.regexp_replace(c, STARS_RE, "")
    c = F.trim(F.regexp_replace(c, WS_RE, " "))
    return F.when(c.rlike(STANDALONE_NUM_RE), F.lit("")).otherwise(c)


def normalize_text_sql(expr: str) -> str:
    """Same normalization as DuckDB SQL (for oracle_sql parity checks)."""
    c = f"regexp_replace({expr}, '{SUPERSCRIPT_RE}', '', 'g')"
    c = f"regexp_replace({c}, '\\(\\d+\\)', '', 'g')"
    c = f"regexp_replace({c}, '\\[\\d+\\]', '', 'g')"
    c = f"regexp_replace({c}, '\\*+', '', 'g')"
    c = f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"
    return f"(case when regexp_matches({c}, '^\\d+$') then '' else {c} end)"


# --- footnote classification (textract_processor.py:98-160) ---------------
# The reference matches 7 marker patterns at line start (case-insensitive),
# then requires content after the marker (len > len(marker)+5) AND either a
# keyword substring or a section reference. Divergence from the reference
# (documented, frozen): we classify on the RAW line, before marker stripping;
# the reference classifies after stripping, which makes its own '(1)'/'[1]'/
# '*' patterns unreachable (SURVEY.md §7.3).
FOOTNOTE_MARKER_RE = r"(?i)^(?:\(\d+\)|\[\d+\]|\d+\.|\*+\s|note\s*\d*:|source:|see\s)"
FOOTNOTE_KEYWORDS = (
    "note",
    "source",
    "see",
    "reference",
    "pursuant",
    "accordance",
    "disclaimer",
    "based on",
    "refers to",
    "includes",
    "excludes",
)
SECTION_REF_RE = r"\b(?:page|section|chapter|exhibit|appendix)\s+\d+"


def is_footnote_col(col: Column) -> Column:
    """Boolean footnote predicate over a raw (unnormalized) line."""
    line = F.trim(col)
    marker = F.regexp_extract(line, FOOTNOTE_MARKER_RE, 0)
    has_marker = marker != F.lit("")
    has_content = F.length(line) > F.length(marker) + F.lit(5)
    low = F.lower(line)
    kw = F.lit(False)
    for k in FOOTNOTE_KEYWORDS:
        kw = kw | low.contains(k)
    kw = kw | low.rlike(SECTION_REF_RE)
    return has_marker & has_content & kw


def footnote_marker_col(col: Column) -> Column:
    """The matched marker text ('' when not a footnote-style line)."""
    return F.regexp_extract(F.trim(col), FOOTNOTE_MARKER_RE, 0)


# inline footnote references (textract_processor.py:149)
FOOTNOTE_REF_RE = r"[\(\[]\d+[\)\]]|\*+(\s|$)"


def has_footnote_refs_col(col: Column) -> Column:
    return F.trim(col).rlike(FOOTNOTE_REF_RE)


# --- boilerplate classification (north_star: HTML boilerplate strip) ------
# Deterministic line-level heuristics, the link-density analog of
# Kohlschütter-style boilerplate removal over plain text lines:
#   * nav bars: >= 2 pipe separators ('Home | About | Contact')
#   * copyright footers: line starts with the © sign
#   * canonical nav words alone on a line
BOILER_PIPE_MIN = 2
BOILER_NAV_RE = (
    r"(?i)^(?:home|about|contact|privacy policy|terms of service"
    r"|skip to content)$"
)


def is_boilerplate_col(col: Column) -> Column:
    line = F.trim(col)
    n_pipes = F.length(line) - F.length(F.regexp_replace(line, r"\|", ""))
    return (
        (n_pipes >= F.lit(BOILER_PIPE_MIN))
        | line.startswith("©")
        | line.rlike(BOILER_NAV_RE)
    )


# --- misc scalar helpers (SURVEY.md §2.7) ----------------------------------
def match_clean_col(col: Column) -> Column:
    """Lower-case + strip $ % , for lexical matching (app.py:83-89, F4)."""
    return F.trim(F.translate(F.lower(col), "$%,", ""))


NUMERIC_FRAGMENT_RE = r"\d+\.?\d*"  # app.py:92 (F5)
