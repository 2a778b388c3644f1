"""Scalar text operators (SURVEY.md §2.8) — all pure Spark SQL expressions.

- numeric-literal tests: strip ','/'%' then float-parsable
  (/root/reference/src/services/table_ocr_service.py:338-352); Vietnamese
  variant maps ',' -> '.' (enhanced_table_ocr_service.py:359-375)
- grade cast: numeric cells -> double, ',' as decimal separator, string
  fallback (enhanced_table_ocr_service.py:583-589)
- metadata extraction: 6 optional fields, ordered alternate regex patterns,
  first match wins, case-insensitive, group(1) trimmed
  (table_ocr_service.py:452-480)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_numeric(c: Column) -> Column:
    """True iff the cell parses as a number after stripping ',' and '%'.
    try_cast (not cast): Spark 4 runs ANSI mode, and the semantic here is
    the reference's try/except float() duck-typing."""
    cleaned = F.regexp_replace(F.trim(c), "[,%]", "")
    return (F.length(cleaned) > 0) & cleaned.try_cast("double").isNotNull()


def is_numeric_vi(c: Column) -> Column:
    """Vietnamese variant: ',' is a decimal separator, '%' stripped."""
    cleaned = F.regexp_replace(F.regexp_replace(F.trim(c), ",", "."), "%", "")
    return (F.length(cleaned) > 0) & cleaned.try_cast("double").isNotNull()


def grade_cast(c: Column) -> Column:
    """Numeric grade -> double with ',' -> '.'; NULL when non-numeric
    (callers coalesce with the raw string for the mixed-type column)."""
    return F.regexp_replace(F.trim(c), ",", ".").try_cast("double")


# Field -> ordered alternate patterns; first non-empty group(1) wins.
# The leading patterns are the reference's table VERBATIM — diacritic
# Vietnamese forms, the second alternates (Học sinh/Student, Khối/Grade),
# the optional [\s:]* separator, and the ordered first-match-wins loop
# (table_ocr_service.py:452-479). Trailing patterns are this repo's
# diacritic-free ASCII supplements (colon REQUIRED, so bare substrings
# like 'ten' in 'often' cannot fire) for the builtin ASCII glyph atlas.
# Case folding note: (?i) folds ASCII in both Spark (Java regex) and the
# DuckDB oracle (RE2); non-ASCII case folding differs per engine, so
# fixtures use the canonical casing the reference's patterns spell out.
METADATA_PATTERNS: dict[str, list[str]] = {
    "student_name": [
        r"(?i)(?:Tên|Họ tên|Name)[\s:]*([^\n\r]+)",
        r"(?i)(?:Học sinh|Student)[\s:]*([^\n\r]+)",
        r"(?i)(?:ho ten|ten)\s*[:]\s*([^\n\r]+)",
    ],
    "class_name": [
        r"(?i)(?:Lớp|Class)[\s:]*([^\n\r]+)",
        r"(?i)(?:Khối|Grade)[\s:]*([^\n\r]+)",
        r"(?i)(?:lop|khoi)\s*[:]\s*([^\n\r]+)",
    ],
    "school": [
        r"(?i)(?:Trường|School)[\s:]*([^\n\r]+)",
        r"(?i)(?:truong)\s*[:]\s*([^\n\r]+)",
    ],
    "subject": [
        r"(?i)(?:Môn|Subject)[\s:]*([^\n\r]+)",
        r"(?i)(?:mon)\s*[:]\s*([^\n\r]+)",
    ],
    "semester": [
        r"(?i)(?:Học kỳ|Semester)[\s:]*([^\n\r]+)",
        r"(?i)(?:hoc ky|hk)\s*[:]\s*([^\n\r]+)",
    ],
    "year": [
        r"(?i)(?:Năm học|Academic year)[\s:]*([^\n\r]+)",
        r"(?i)(?:nam hoc|year)\s*[:]\s*([0-9]{4}(?:\s*-\s*[0-9]{4})?)",
    ],
}


def extract_metadata_field(text: Column, field: str) -> Column:
    """First-matching-pattern extraction; empty match -> NULL."""
    alts = [
        F.nullif(F.trim(F.regexp_extract(text, pat, 1)), F.lit(""))
        for pat in METADATA_PATTERNS[field]
    ]
    return F.coalesce(*alts) if len(alts) > 1 else alts[0]


def extract_metadata(text: Column) -> Column:
    """All six fields as a struct (SURVEY.md D6)."""
    return F.struct(
        *[extract_metadata_field(text, f).alias(f) for f in METADATA_PATTERNS]
    )
