"""String scalar operators (SURVEY.md §2.8, F1–F16).

Pure column expressions — every one of the reference's row-at-a-time
``apply``/``map`` string transforms is vectorized here and runs inside
whole-stage codegen. Reference citations are to SGC-CGS/geo-explorer-etl
file:line for parity checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — strip "NN. " sort prefix from member names (reference dfhandler.py:55–57).
# The reference pattern matches integers 0..999 with optional zero-padding to
# at most 4 digits ("02.", "0999.") — "1000." is NOT a prefix — and then
# applies ``.lstrip()`` unconditionally, so unprefixed names with leading
# whitespace are trimmed too.  ``^(?:\d{1,3}|0\d{3})\.`` is exhaustively
# equivalent to the reference's alternation (verified over every digit string
# of length 1–5); ``(?U)`` makes Java's ``\s`` match the same Unicode
# whitespace set Python's ``str.lstrip`` strips.
_SORT_PREFIX_RE = r"^(?:\d{1,3}|0\d{3})\."


def strip_sort_prefix(col: Column) -> Column:
    """``"02. Resident owners" -> "Resident owners"``."""
    return F.regexp_replace(
        F.regexp_replace(col, _SORT_PREFIX_RE, ""), r"(?U)^\s+", ""
    )


def strip_coordinate_geography(coordinate: Column) -> Column:
    """F2 — drop the first (geography) element of a dotted coordinate.

    ``"1.2.3" -> "2.3"`` (reference dfhandler.py:210–214).
    """
    return F.regexp_replace(coordinate, r"^[^.]+\.", "")


def geo_level_recode(level: Column) -> Column:
    """F3 — collapse census-subdivision variants S0504/S0505/S0506 into
    S0503 (reference dfhandler.py:160–161)."""
    return F.regexp_replace(level, "S0504|S0505|S0506", "S0503")


def dguid_scrub(dguid: Column) -> Column:
    """F4 — remove stray dots and repair the ``201A`` vintage typo
    (reference dfhandler.py:678)."""
    return F.regexp_replace(F.regexp_replace(dguid, r"\.", ""), "^201A", "2015A")


def dguid_repair(dguid: Column, ref_year: Column) -> Column:
    """F5 — order-sensitive DGUID repair chain, faithful to reference
    ``fix_dguid`` (dfhandler.py:597–617; called with vintage=RefYear at
    dfhandler.py:679). Six rules, IN ORDER, all unanchored literal
    replaces (the reference uses ``str.replace``):

      1. short ids (<10 chars) get a default vintage+schema prepended:
         vintage <2016 -> ``2016A0025`` (1998–2015 use 2016
         geographies), else ``{vintage}A0025``;
      2. schema typo: ``2011B`` -> ``2011S``;
      3. St. John's typo: ``2011S05031`` -> ``2011S0503001``;
      4. CMAs incorrectly tagged 2011 vintage — only when vintage
         >= 2016: ``2011S0503`` -> ``{vintage}S0503``;
      5. Belleville (CA until 2011): ``2011S0503522`` -> ``2011S0504522``;
      6. Lethbridge (CA until 2011): ``2011S0503810`` -> ``2011S0504810``.

    Rules 5/6 only ever fire when rule 4 did not (vintage < 2016) —
    same net behaviour as the reference's sequential replaces. Pure
    column expressions (``F.replace`` = literal, not regex); no UDF.
    Null DGUIDs propagate as null (the reference skips ``<NA>``).
    """
    year = ref_year.cast("int")
    step1 = F.when(
        F.length(dguid) < 10,
        F.concat(
            F.when(year < 2016, F.lit("2016")).otherwise(year.cast("string")),
            F.lit("A0025"),
            dguid,
        ),
    ).otherwise(dguid)
    step2 = F.replace(step1, F.lit("2011B"), F.lit("2011S"))
    step3 = F.replace(step2, F.lit("2011S05031"), F.lit("2011S0503001"))
    step4 = F.when(
        year >= 2016,
        F.replace(step3, F.lit("2011S0503"), F.concat(year.cast("string"), F.lit("S0503"))),
    ).otherwise(step3)
    step5 = F.replace(step4, F.lit("2011S0503522"), F.lit("2011S0504522"))
    return F.replace(step5, F.lit("2011S0503810"), F.lit("2011S0504810"))


def composite_code(*parts: Column, sep: str = ".") -> Column:
    """F6 — composite natural keys: ``IndicatorCode = pid.coord.date``,
    ``IndicatorValueCode = DGUID.IndicatorCode`` (reference
    dfhandler.py:213, 285, 451)."""
    return F.concat_ws(sep, *parts)


def html_member_list(year_col: Column, names_col: Column, sep: str = " _ ") -> Column:
    """F7 — indicator display ``<ul><li>year<li>m1<li>m2</li></ul>``
    built by replacing the member separator with ``<li>`` (reference
    dfhandler.py:87–90, 286–287)."""
    return F.concat(
        F.lit("<ul><li>"),
        year_col.cast("string"),
        F.lit("<li>"),
        F.regexp_replace(names_col, sep, "<li>"),
        F.lit("</li></ul>"),
    )


def nth_delimited(col: Column, n: int, sep: str = " _ ") -> Column:
    """F8 — nth element of a delimited string; negative n counts from the
    end (legend member = second-to-last, last member = -1; reference
    helpers.py:104–113, dfhandler.py:275–279, 291–294). Out-of-range
    returns ``""`` like the reference's IndexError branch — and keeps
    ANSI-mode ``element_at`` from throwing on short lists."""
    return F.coalesce(F.try_element_at(F.split(col, sep), F.lit(n)), F.lit(""))


def substring_after_first(col: Column, sep: str = "/") -> Column:
    """F9 — text after the first separator (subject descriptions,
    reference helpers.py:116–121). ``"a/b/c" -> "b/c"``; when the part
    after the first separator is empty — no separator at all, OR a
    trailing separator like ``"a/"`` — the reference's
    ``str.partition`` branch returns the input unchanged (anchored
    regex plus one emptiness guard, still a single row-local pass)."""
    import re

    stripped = F.regexp_replace(col, "^[^" + re.escape(sep) + "]*" + re.escape(sep), "")
    return F.when(stripped == "", col).otherwise(stripped)


def ordinal_prefix(order_col: Column, width: int = 2) -> Column:
    """F10 — zero-padded display prefix ``7 -> "07. "`` (reference
    dfhandler.py:102–104)."""
    return F.concat(F.lpad(order_col.cast("string"), width, "0"), F.lit(". "))


def truncate_for_column(col: Column, n: int) -> Column:
    """F11 — fixed-width truncation before insert (reference
    dfhandler.py:108–109, 299, 366–371, 420–423, 532–536)."""
    return F.substring(col, 1, n)


def dguid_geo_level(dguid: Column) -> Column:
    """F12 — geographic level is chars 5–9 of the DGUID (reference
    dfhandler.py:685)."""
    return F.substring(dguid, 5, 5)


def subject_code_of_product(product_id: Column) -> Column:
    """F12b — subject code is the first 2 digits of the product id
    (reference helpers.py:124–126)."""
    return F.substring(product_id.cast("string"), 1, 2)


def vector_id(vector: Column) -> Column:
    """F15 — ``"v123456" -> 123456`` as int (reference dfhandler.py:684)."""
    return F.regexp_replace(vector, "^v", "").cast("int")


def generic_wildcard_code(ind_code: Column, sep: str = ".") -> Column:
    """F16 — related-indicator generic code (reference
    set_generic_indicator_code, dfhandler.py:637–644): the input is a
    full IndicatorCode ``pid.coord....date``; the THIRD-from-last
    element (= second-to-last coordinate element, since the date is the
    final element) becomes ``%`` and the last TWO elements are kept:

    ``"13100778.4.1.2.1.2018-01-01" -> "13100778.4.1.%.1.2018-01-01"``

    Codes with <= 3 elements return null (the reference's len guard).
    Array surgery, not regex, so ``%`` can't be misplaced by repeats.
    """
    parts = F.split(ind_code, r"\.")
    n = F.size(parts)
    replaced = F.concat(
        F.slice(parts, 1, n - 3),
        F.array(F.lit("%")),
        F.slice(parts, n - 1, 2),
    )
    return F.when(n > 3, F.array_join(replaced, sep)).otherwise(F.lit(None))
