from ethiopia_legal_etl_spark.functions.text import (
    YEAR_REGEX,
    absolutize_url,
    base_name_from_url,
    extract_year,
    is_pdf_content_type,
    resource_type,
    title_from_base_name,
)

__all__ = [
    "YEAR_REGEX",
    "absolutize_url",
    "base_name_from_url",
    "extract_year",
    "is_pdf_content_type",
    "resource_type",
    "title_from_base_name",
]
