"""Null-handling / conversion / lookup scalar operators
(SURVEY.md §2.10–§2.11, M1–M5, L6).

Spark nulls replace the reference's NaN->None shuffling
(reference dfhandler.py:457) for free; the interesting ops are the
CASE-formatting used by the generated read-side queries and the
default-filling of chart metadata.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uom_from_combo(combo_uoms: Column, sep: str = "[ \t\n\f\r]+") -> Column:
    """M1 — extract the single real UOM code from a member-combination
    UOM string like ``"nan nan 229.0"`` (reference dfhandler.py:263–265).

    Spark-first: filter the split array to numeric tokens and take the
    last, instead of the reference's strip->float->int cast chain.
    """
    tokens = F.split(combo_uoms.cast("string"), sep)
    numeric = F.filter(tokens, lambda t: t.rlike(r"^\d+(\.\d+)?$"))
    # try_element_at: an all-NaN combo has no numeric token -> NULL
    # (ANSI element_at would throw on the empty array).
    return F.try_element_at(numeric, F.lit(-1)).cast("double").cast("smallint")


def with_defaults(df_cols: dict[str, Column], defaults: dict[str, object]) -> list[Column]:
    """M3 — coalesce existing chart metadata with per-product defaults
    (reference dfhandler.py:335–339, 471, 507)."""
    return [
        F.coalesce(col, F.lit(defaults[name])).alias(name)
        if name in defaults
        else col.alias(name)
        for name, col in df_cols.items()
    ]


def null_display_case(value: Column, symbol: Column, decimals: int = 2) -> Column:
    """M5 — the generated queries' null-display CASE (reference
    dfhandler.py:345–347, 522–524, 647–666):

    ``CASE WHEN value IS NULL THEN nullreason.symbol
           ELSE Format(value, 'N', locale) END``

    T-SQL ``Format(v,'N','en-US')`` -> ``format_number`` (same
    thousands-separator semantics for en-US; fr-CA variant is handled
    by the presentation layer).
    """
    return F.when(value.isNull(), symbol).otherwise(
        F.format_number(value, decimals)
    )


def dummy_subject_suffix(code: Column) -> Column:
    """L6 — dummy subject-code suffix by code length (int-overflow
    workaround in the reference, helpers.py:58–61)."""
    return F.when(F.length(code.cast("string")) > 4, F.lit("99")).otherwise(F.lit("9999"))


def format_number_locale(value: Column, locale: str = "en-US", decimals: int = 1) -> Column:
    """M5 locale variant — T-SQL ``Format(v, 'N', locale)`` analog
    (reference dfhandler.py:647–666 emits both en-US and fr-CA
    formatting in the generated queries).

    en-US: ``1,234.5``; fr-CA: ``1 234,5`` (space thousands, comma
    decimal) — produced by re-mapping en-US separators with
    ``translate``, still a pure column expression.
    """
    base = F.format_number(value, decimals)
    if locale.lower() in ("fr-ca", "fr"):
        return F.translate(base, ",.", " ,")
    return base


def null_display_case_locale(
    value: Column, symbol: Column, locale: str = "en-US", decimals: int = 1
) -> Column:
    """The generated queries' dual-locale CASE: null -> status symbol,
    else locale-formatted number (reference dfhandler.py:345–347)."""
    return F.when(value.isNull(), symbol).otherwise(
        format_number_locale(value, locale, decimals)
    )
