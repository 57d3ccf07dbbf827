"""Central query/oracle registry: every operator module exposes ``QUERIES``
(name → callable taking an sf dir) and optionally ``ORACLES`` (name → ANSI
SQL DuckDB mirror). ``__ray_entry__`` and the CLI both read from here."""

from __future__ import annotations

from typing import Any, Callable


def registry() -> tuple[dict[str, Callable[[str], Any]], dict[str, str]]:
    from .functions import (
        corpus_ops,
        decontam,
        dedup,
        importance,
        joins,
        repetition,
        search,
        similarity,
        sketch,
        text_stats,
        window,
    )
    from .pipelines import (
        clean,
        curate,
        dom_templates,
        extract_queries,
        media,
        relational,
        syndication,
        tpch_rest,
        train_feed,
        webannot_queries,
    )
    from .sources import inverted_index, zorder_layout
    from .state import dedup_index

    queries: dict[str, Callable[[str], Any]] = {}
    oracles: dict[str, str] = {}
    for mod in (
        clean,
        curate,
        dom_templates,
        extract_queries,
        media,
        relational,
        syndication,
        tpch_rest,
        train_feed,
        webannot_queries,
        zorder_layout,
        inverted_index,
        dedup_index,
        corpus_ops,
        decontam,
        dedup,
        importance,
        joins,
        repetition,
        search,
        similarity,
        sketch,
        text_stats,
        window,
    ):
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def all_queries() -> dict[str, Callable[[str], Any]]:
    return registry()[0]


def all_oracles() -> dict[str, str]:
    return registry()[1]
