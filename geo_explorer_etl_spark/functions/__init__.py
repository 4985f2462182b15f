"""Scalar column-function library (zero Python UDFs).

Each function is ``Column -> Column`` built from ``pyspark.sql.functions``
so it stays inside whole-stage codegen. Names track SURVEY.md §2.8–§2.11
operator ids (F*, D*, M*, L*).
"""

from geo_explorer_etl_spark.functions.strings import (  # noqa: F401
    composite_code,
    dguid_geo_level,
    dguid_repair,
    dguid_scrub,
    generic_wildcard_code,
    geo_level_recode,
    html_member_list,
    nth_delimited,
    ordinal_prefix,
    strip_coordinate_geography,
    strip_sort_prefix,
    subject_code_of_product,
    substring_after_first,
    truncate_for_column,
    vector_id,
)
from geo_explorer_etl_spark.functions.dates import (  # noqa: F401
    FREQ_SPEC,
    date_series,
    format_date,
    ref_year_normalize,
    year_to_jan1,
)
from geo_explorer_etl_spark.functions.nulls import (  # noqa: F401
    dummy_subject_suffix,
    null_display_case,
    uom_from_combo,
    with_defaults,
)
