"""User-facing library API — the reference's extension surface re-expressed
(``core/api/OpenDataLoaderPDF.java:39-51`` ``processFile``; ``py/wrapper.py:92``
``convert()``; split-phase ``extractContents`` → ``writeOutputs``).

``convert`` processes ONE document in-process (no Ray); ``process_dataset``
is the distributed path (actor-pool map_batches over any Dataset with an
``html`` column)."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from .config import ExtractorConfig, SanitizationRule
from .extractor import ContentSanitizer, ExtractResult, extract
from .extractor.html_out import to_html
from .extractor.linearize import to_json_dict, to_markdown, to_text

FORMATS = ("text", "markdown", "json", "html")


def convert(html: Union[bytes, str], config: Optional[ExtractorConfig] = None,
            output_formats: Optional[List[str]] = None,
            file_name: str = "") -> Dict[str, object]:
    """One-document convert: html → {format: serialized output}.

    Mirrors the reference CLI's per-file behavior: extract once, serialize to
    every requested format from the same block tree."""
    config = config or ExtractorConfig()
    formats = output_formats or ["text"]
    unknown = set(formats) - set(FORMATS)
    if unknown:
        raise ValueError(f"unknown output formats: {sorted(unknown)}; "
                         f"supported: {FORMATS}")
    result = extract(html, config)
    out: Dict[str, object] = {}
    for fmt in formats:
        if fmt == "text":
            out["text"] = result.text
        elif fmt == "markdown":
            out["markdown"] = to_markdown(result.pages, config)
        elif fmt == "json":
            out["json"] = to_json_dict(result.pages, config, file_name)
        elif fmt == "html":
            out["html"] = to_html(result.pages, config)
    out["metrics"] = {"n_blocks": result.n_blocks, "n_pages": result.n_pages,
                      "replacement_ratio": result.replacement_ratio}
    return out


def add_filter_rule(config: ExtractorConfig, pattern: str,
                    replacement: str) -> ExtractorConfig:
    """Custom sanitization rule — the reference's one true UDF hook
    (``core/api/FilterConfig.java:193-204`` addFilterRule)."""
    return config.with_(
        sanitize=True,
        sanitization_rules=config.sanitization_rules
        + (SanitizationRule(pattern, replacement),),
    )


def process_dataset(ds, config: Optional[ExtractorConfig] = None,
                    include_blocks: bool = True, concurrency: int = 8,
                    batch_size: int = 64):
    """Distributed convert: Dataset with an ``html: binary`` column →
    Dataset with text/blocks/metrics columns (actor-pool stage).

    Consume the result as Arrow (``iter_batches(batch_format="pyarrow")`` /
    ``write_parquet``). ``to_pandas()`` on a result whose ``blocks`` column
    mixes null rows (null html payloads) with struct lists trips Ray's tensor
    extension casting — if you need pandas there, set
    ``DataContext.get_current().enable_tensor_extension_casting = False``."""
    from .stages.extract_stage import HtmlExtractor

    return ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"cfg": config or ExtractorConfig(),
                               "include_blocks": include_blocks},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.8,
    )
