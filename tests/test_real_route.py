"""Flagship real-decoder route (preset="real") end-to-end tests: the
real-payload corpus (valid minimal PDFs / PNGs, synth_pages real_payloads)
through REAL_ROUTE must produce byte-identical text per url on EVERY route
at once — HTML main text, per-page PDF text joined with the reference
separator, PNG decoded-metadata lines — and garbage rows must fail with the
reference error message (ocr_service.py:173-207 semantics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
from simple_content_ocr_ray.sources.synth_pages import (
    pages_table_from_documents,
    payload_class,
    real_pdf_page_texts,
    url_for,
)
from simple_content_ocr_ray.stages.pdf_text import PAGE_SEP


def _docs_table(n: int = 60) -> pa.Table:
    texts = [
        " ".join(f"word{(i * 7 + j) % 31}" for j in range(5 + i % 9))
        for i in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def real_extracted(ray_session):
    docs = _docs_table()
    pages = pages_table_from_documents(docs, real_payloads=True)
    out = (
        extraction_pipeline(rd.from_arrow(pages), preset="real")
        .to_pandas()
        .set_index("url")
    )
    return docs, out


def test_every_route_completes_or_fails_exactly(real_extracted):
    docs, out = real_extracted
    for d in docs["doc_id"].to_pylist():
        row = out.loc[url_for(d)]
        cls = payload_class(d)
        if cls == "garbage":
            assert row["status"] == "failed"
            assert row["error"] == (
                "Unsupported document type: application/octet-stream"
            )
        else:
            assert row["status"] == "completed", (d, cls, row["error"])


def test_pdf_route_recovers_page_text_byte_exact(real_extracted):
    docs, out = real_extracted
    texts = docs["text"].to_pylist()
    for d in docs["doc_id"].to_pylist():
        if payload_class(d) != "pdf":
            continue
        row = out.loc[url_for(d)]
        pages = real_pdf_page_texts(d, texts[d])
        assert row["text"] == PAGE_SEP.join(pages)
        assert row["page_count"] == len(pages) == 1 + d % 3
        assert row["metadata"]["engine"] == "pdf-text"


def test_png_route_decodes_real_pixels(real_extracted):
    docs, out = real_extracted
    for d in docs["doc_id"].to_pylist():
        if payload_class(d) != "image":
            continue
        row = out.loc[url_for(d)]
        w, h, v = 16 + d % 9, 4 + d % 7, d % 256
        assert row["text"] == f"[image {w}x{h} ch=1 brightness={float(v)}]"
        assert row["metadata"]["engine"] == "png-decode"


def test_html_route_byte_identical_main_text(real_extracted):
    docs, out = real_extracted
    texts = docs["text"].to_pylist()
    for d in docs["doc_id"].to_pylist():
        if payload_class(d) != "html":
            continue
        assert out.loc[url_for(d)]["text"] == texts[d]


def test_real_and_mock_corpora_share_html_and_garbage_bytes():
    # the two payload modes differ ONLY on pdf/image rows — HTML extraction
    # oracles hold identically on both corpora
    docs = _docs_table(20)
    real = pages_table_from_documents(docs, real_payloads=True)
    mock = pages_table_from_documents(docs)
    for i in range(real.num_rows):
        d = real["url"][i].as_py()
        cls = payload_class(docs["doc_id"][i].as_py())
        if cls in ("html", "garbage"):
            assert real["html"][i].as_py() == mock["html"][i].as_py(), d


def test_jpeg_route_in_real_preset(ray_session):
    # REAL_ROUTE sends jpeg → the from-scratch baseline decoder
    from simple_content_ocr_ray.stages.jpeg_decode import make_jpeg

    jpg = make_jpeg(np.full((6, 12), 200, np.uint8))
    pages = pa.table(
        {
            "url": ["https://x.example/jpg"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([jpg], pa.binary()),
            "text": [""],
            "lang": ["en"],
        }
    )
    out = extraction_pipeline(rd.from_arrow(pages), preset="real").to_pandas()
    assert out["status"][0] == "completed"
    assert out["content_type"][0] == "jpeg"
    assert out["text"][0] == "[image 12x6 ch=1 brightness=200.0]"


@pytest.mark.parametrize("nblocks,batch_size", [(1, None), (7, 16), (16, 8)])
def test_real_route_deterministic_across_parallelism(
    ray_session, nblocks, batch_size
):
    """The real-decoder route produces IDENTICAL rows at every block /
    batch partitioning — the byte-identical-per-url invariant must not
    depend on the physical plan."""
    docs = _docs_table(40)
    pages = pages_table_from_documents(docs, real_payloads=True)
    ds = rd.from_arrow(pages).repartition(nblocks)
    out = (
        extraction_pipeline(
            ds, preset="real", batch_size=batch_size, concurrency=(1, 2)
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    global _REAL_DET_BASELINE
    if "_REAL_DET_BASELINE" not in globals():
        _REAL_DET_BASELINE = out[["url", "status", "text", "page_count"]]
    else:
        import pandas as pd

        pd.testing.assert_frame_equal(
            out[["url", "status", "text", "page_count"]], _REAL_DET_BASELINE
        )


def test_hostile_corpus_per_doc_error_classes(ray_session):
    """r5: every hostile doc individually lands in ITS class (stronger than
    the oracled per-class counts), stable across partitionings."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.pipelines.extract_queries import (
        _HOSTILE_CLASSES,
        _classify_hostile_row,
        _hostile_payload,
    )
    from simple_content_ocr_ray.sources.synth_pages import PAGES_SCHEMA

    ids = list(range(32))
    t = pa.Table.from_arrays(
        [
            pa.array([f"https://h.example/{d:08d}" for d in ids]),
            pa.array([0] * len(ids), pa.timestamp("us")),
            pa.array(
                [_hostile_payload(d, f"text {d}", "en") for d in ids],
                pa.binary(),
            ),
            pa.array([""] * len(ids)),
            pa.array(["en"] * len(ids)),
        ],
        schema=PAGES_SCHEMA,
    )
    for nparts in (1, 5):
        ds = extraction_pipeline(
            rd.from_arrow(t).repartition(nparts), preset="real"
        )
        rows = {r["url"]: r for r in ds.take_all()}
        assert len(rows) == len(ids)
        for d in ids:
            r = rows[f"https://h.example/{d:08d}"]
            got = _classify_hostile_row(
                r["status"], r["content_type"], r["error"], r["text"]
            )
            assert got == _HOSTILE_CLASSES[d % 8], (d, got, dict(r))
