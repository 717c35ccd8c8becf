"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay pipeline (documents → synthetic
change events → extract → salted LWW merge → copy-on-write lake) on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2); ``oracle_sql()`` the matching DuckDB SQL.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent))

from opendataloader_pdf_ray.pipelines.cdc_queries import CDC_ORACLE_SQL, CDC_QUERIES
from opendataloader_pdf_ray.pipelines.flagship import run_flagship


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(CDC_QUERIES)
    try:
        from opendataloader_pdf_ray.pipelines.tpch import TPCH_QUERIES

        out.update(TPCH_QUERIES)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.documents import DOC_QUERIES

        out.update(DOC_QUERIES)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.embeddings import EMB_QUERIES

        out.update(EMB_QUERIES)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.hybrid_queries import HYBRID_QUERIES

        out.update(HYBRID_QUERIES)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.multimodal_queries import MM_QUERIES

        out.update(MM_QUERIES)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.warc_queries import WARC_QUERIES

        out.update(WARC_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(CDC_ORACLE_SQL)
    try:
        from opendataloader_pdf_ray.pipelines.tpch import TPCH_ORACLE_SQL

        out.update(TPCH_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.documents import DOC_ORACLE_SQL

        out.update(DOC_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.embeddings import EMB_ORACLE_SQL

        out.update(EMB_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.hybrid_queries import HYBRID_ORACLE_SQL

        out.update(HYBRID_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.multimodal_queries import MM_ORACLE_SQL

        out.update(MM_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from opendataloader_pdf_ray.pipelines.warc_queries import WARC_ORACLE_SQL

        out.update(WARC_ORACLE_SQL)
    except ImportError:
        pass
    return out
