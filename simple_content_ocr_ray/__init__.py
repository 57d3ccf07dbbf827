"""simple_content_ocr_ray — a Ray-Data-native content-extraction engine.

A from-scratch rebuild of the data-processing capabilities of
tendant/simple-content-ocr (reference at /root/reference, read-only) as
idiomatic Ray Data pipelines: ``ray.data.read_parquet`` over Common-Crawl-style
page tables, ``map_batches`` over zero-copy Arrow batches, actor pools for
stateful extraction engines, explicit partitioning/shuffle for the wide steps,
and partition-granular manifests for resume.

Layout:
  reference_semantics  — plain-Python, Ray-free reimplementation of the
                         reference's per-document semantics (the correctness
                         anchor for byte-identical output tests).
  sources/             — deterministic synthetic ``pages`` table generator and
                         pruned parquet readers.
  stages/              — map_batches stages: content sniffing, extractors
                         (HTML main-content, mock OCR), finalize, registry.
  pipelines/           — end-to-end pipeline builders + relational queries.
  functions/           — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                         embedding), similarity search, text analysis, windows.
  state/               — per-partition manifest checkpoint + resume.
"""

__version__ = "0.1.0"

PIN_PROCESSED_AT = "2024-01-01T00:00:00+00:00"
"""Pinned 'processed at' timestamp.

The reference's mock engine embeds ``datetime.now(UTC).isoformat()`` in its
output (src/simple_ocr/adapters/mock_engine.py:173), which makes outputs
non-deterministic. This rebuild pins it so extracted text is byte-identical
across runs and parallelism levels (documented determinism divergence).
"""
