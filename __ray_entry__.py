"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on pages synthesized
deterministically from /root/testdata/sf0.001 (input_hint shape). The
``queries()`` / ``oracle_sql()`` pairs cover the operator inventory in
SURVEY.md §2 plus the training-data-pipeline extensions (dedup, similarity,
temporal joins, search, sketches, clustering, multimodal, cleaning). Ray is
initialised by the driver before this module is imported — nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: pages(url, warc_ts, html, text, lang) → sniff →
    extractor actor pool → extracted table (SURVEY.md §3.4). Runs the REAL
    decoder preset on a real-payload corpus: html-main-content for HTML,
    from-scratch pdf-text for PDFs, from-scratch png-decode for PNGs
    (stages/extract.py REAL_ROUTE) — matching the reference's always-real
    engines (ocr_service.py:83-108)."""
    from simple_content_ocr_ray.pipelines.extract import (
        extraction_pipeline,
        read_pages,
    )
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    pages_dir = synth_pages_parquet("/root/testdata/sf0.001", real_payloads=True)
    return extraction_pipeline(read_pages(pages_dir), preset="real")


def _registry() -> tuple[dict[str, Callable[[str], Any]], dict[str, str]]:
    from simple_content_ocr_ray.registry import registry

    return registry()


def queries() -> dict[str, Callable[[str], Any]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
