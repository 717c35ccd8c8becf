from .extract import ExtractResult, extract, extract_text
from .sanitizer import ContentSanitizer

__all__ = ["ExtractResult", "extract", "extract_text", "ContentSanitizer"]
