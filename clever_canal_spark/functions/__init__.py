from .transforms import (
    enrich_udf,
    extract_text_from_html,
    html_to_text_udf,
    lang_tag_udf,
    tag_language,
    with_page_transforms,
)

__all__ = [
    "extract_text_from_html",
    "tag_language",
    "html_to_text_udf",
    "lang_tag_udf",
    "with_page_transforms",
]
