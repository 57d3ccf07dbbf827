"""Unit tests for the Ray-free reference-semantics anchor, mirroring the
reference's own unit assertions (tests/unit/test_ocr_adapters.py in
/root/reference)."""

from simple_content_ocr_ray import PIN_PROCESSED_AT
from simple_content_ocr_ray.reference_semantics import (
    combine_pages,
    estimate_page_count,
    extract_row,
    format_size,
    mock_markdown,
    sniff_bytes,
)


def test_format_size():
    # mirrors test_ocr_adapters.py:113-117 semantics
    assert format_size(512) == "512.0 B"
    assert format_size(2048) == "2.0 KB"
    assert format_size(5 * 1024 * 1024) == "5.0 MB"
    assert format_size(3 * 1024**3) == "3.0 GB"
    assert format_size(2 * 1024**4) == "2.0 TB"


def test_page_count_thresholds():
    # 1 KB PDF → 1 page; 100 KB → 2 pages (reference: 50 KB/page integer div)
    assert estimate_page_count("application/pdf", 1024) == 1
    assert estimate_page_count("application/pdf", 100 * 1024) == 2
    assert estimate_page_count("application/pdf", 200 * 1024) == 4
    assert estimate_page_count("application/vnd.docx", 61440) == 2
    assert estimate_page_count("image/png", 10**9) == 1


def test_mock_markdown_contents():
    md = mock_markdown("document", "application/pdf", 150 * 1024, 3)
    assert md.startswith("# Mock OCR Result")
    assert "## Document Information" in md
    assert "Lorem ipsum" in md
    assert "## Page 1" in md and "## Page 3" in md
    assert "### Section 3.2" in md
    assert "- **Size**: 150.0 KB" in md
    assert f"- **Processed**: {PIN_PROCESSED_AT}" in md
    # single page: no per-page headers
    md1 = mock_markdown("image", "image/png", 100, 1)
    assert "## Page" not in md1


def test_mock_markdown_deterministic():
    a = mock_markdown("document", "application/pdf", 4096, 2)
    b = mock_markdown("document", "application/pdf", 4096, 2)
    assert a == b


def test_combine_pages():
    # single page passes through byte-identically
    assert combine_pages(["# only"]) == "# only"
    out = combine_pages(["# p1", "# p2", "# p3"])
    assert out == "# p1\n\n---\n\n<!-- Page 2 -->\n\n# p2\n\n---\n\n<!-- Page 3 -->\n\n# p3"


def test_sniff():
    assert sniff_bytes(b"%PDF-1.4\nxxxx") == "pdf"
    assert sniff_bytes(b"\x89PNG\r\n\x1a\nabc") == "png"
    assert sniff_bytes(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_bytes(b"GIF89a...") == "gif"
    assert sniff_bytes(b"RIFF\x00\x00\x00\x00WEBPVP8") == "webp"
    assert sniff_bytes(b"<!doctype html><html>") == "html"
    assert sniff_bytes(b"  \n<HTML><body>") == "html"
    assert sniff_bytes(b"not an image") == "unknown"
    assert sniff_bytes(b"") == "unknown"


def test_extract_row_failure_containment():
    row = extract_row("u", b"garbage bytes here")
    assert row["status"] == "failed"
    assert "Unsupported document type" in row["error"]
    assert row["text"] == ""


def test_extract_row_pdf():
    payload = b"%PDF-1.4\n" + b"x" * (120 * 1024)
    row = extract_row("u", payload)
    assert row["status"] == "completed"
    assert row["content_type"] == "pdf"
    assert row["page_count"] == (len(payload) // 51200)
    assert "## Page 2" in row["text"]


def test_sniff_stage_window_matches_oracle():
    """The vectorized sniff stage must classify exactly like sniff_bytes even
    for HTML behind long leading whitespace (review finding: 64B prefix)."""
    import pyarrow as pa

    from simple_content_ocr_ray.stages.sniff import sniff_batch

    payloads = [
        b"\n" * 100 + b"<!doctype html><html><body><p>x</p></body></html>",
        b" " * 200 + b"<HTML><body>y</body></html>",
        b"\n" * 300 + b"<!doctype html>",  # whitespace beyond the window
        b"%PDF-1.4\nxx",
    ]
    t = pa.table({"html": pa.array(payloads, pa.binary())})
    got = sniff_batch(t)["content_type"].to_pylist()
    assert got == [sniff_bytes(p) for p in payloads]
    assert got[:2] == ["html", "html"]
