"""Per-row job-hint handling (reference job-processing spec.md:160-202):
timeout_seconds, resolution, output_format, force, unknown-hint tolerance."""

import pyarrow as pa
import ray.data as rd

from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
from simple_content_ocr_ray.stages.extract import hint_truthy, parse_hints


def test_parse_hints_formats():
    assert parse_hints("resolution=1024,force=true") == {
        "resolution": "1024",
        "force": "true",
    }
    assert parse_hints('{"resolution": 640, "output_format": "markdown"}') == {
        "resolution": "640",
        "output_format": "markdown",
    }
    assert parse_hints("") == {}
    assert parse_hints(None) == {}
    assert parse_hints("{not json") == {}  # malformed → empty, never a failure
    assert hint_truthy("TRUE") and hint_truthy("1") and not hint_truthy("no")


def _html_pages(hints: list):
    n = len(hints)
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(n)]),
            "html": pa.array(
                [b"<!doctype html><html><body><p>hello hint</p></body></html>"] * n,
                pa.binary(),
            ),
            "hints": pa.array(hints, pa.string()),
        }
    )


def test_unknown_hints_do_not_fail_rows():
    t = _html_pages(["wibble=1,frob=yes", "", "output_format=markdown"])
    out = extraction_pipeline(rd.from_arrow(t), concurrency=1).take_all()
    assert all(r["status"] == "completed" for r in out)


def test_timeout_seconds_hint_overrides_default():
    import time

    from simple_content_ocr_ray.stages.engines import EngineResult

    class Sleepy:
        def extract(self, url, payload, content_type):
            time.sleep(0.6)
            return EngineResult(text="slow but fine")

    t = _html_pages(["timeout_seconds=0.2", "", "timeout_seconds=notanumber"])
    out = extraction_pipeline(
        rd.from_arrow(t), route={"html": Sleepy}, concurrency=1
    ).take_all()
    by_url = {r["url"]: r for r in out}
    # hinted row times out; un-hinted and malformed-hint rows run to completion
    assert by_url["u0"]["status"] == "failed"
    assert "timeout" in by_url["u0"]["error"].lower()
    assert by_url["u1"]["status"] == "completed"
    assert by_url["u2"]["status"] == "completed"


def test_resolution_hint_caps_image_dims():
    payload = b"\x89PNG\r\n\x1a\n" + b"p" * 5000  # stub dims: 64+(5008%1024)=928...
    t = pa.table(
        {
            "url": pa.array(["img0", "img1"]),
            "html": pa.array([payload, payload], pa.binary()),
            "hints": pa.array(["resolution=128", ""], pa.string()),
        }
    )
    out = extraction_pipeline(
        rd.from_arrow(t),
        route={"png": "image-decode-stub"},
        concurrency=1,
    ).take_all()
    by_url = {r["url"]: r for r in out}
    w0 = int(by_url["img0"]["metadata"]["width"])
    h0 = int(by_url["img0"]["metadata"]["height"])
    assert w0 <= 128 and h0 <= 128
    # no hint → unchanged size-derived dims
    assert int(by_url["img1"]["metadata"]["width"]) > 128


def test_force_reprocesses_finished_partitions(tmp_path):
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet
    from simple_content_ocr_ray.state.manifest import run_partitioned_extraction

    pages_dir = synth_pages_parquet("/root/testdata/sf0.001")
    out_dir = str(tmp_path / "out")
    s1 = run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    assert s1["processed"] > 0
    s2 = run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    assert s2["processed"] == 0  # idempotent skip
    s3 = run_partitioned_extraction(pages_dir, out_dir, force=True, concurrency=2)
    assert s3["processed"] == s1["processed"] and s3["skipped"] == 0
    assert (
        rd.read_parquet(out_dir).count()
        == rd.read_parquet(pages_dir).count()
    )


def test_max_payload_bytes_admission_cap(ray_session):
    """The reference declares max_image_size but never enforces it
    (config.py:105-108); here an over-limit payload becomes a failed ROW
    before any engine runs, and in-limit rows are untouched."""
    import pyarrow as pa

    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    big = b"<!doctype html>" + b"x" * 5000
    small = b"<!doctype html><article><p>ok body text</p></article>"
    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["https://c.example/big", "https://c.example/small"],
                "warc_ts": pa.array([0, 0], pa.timestamp("us")),
                "html": [big, small],
                "text": ["", ""],
                "lang": ["", ""],
            }
        )
    )
    out = (
        extraction_pipeline(pages, preset="real", max_payload_bytes=1024)
        .to_pandas()
        .set_index("url")
    )
    assert out.loc["https://c.example/big", "status"] == "failed"
    assert "max: 1024" in out.loc["https://c.example/big", "error"]
    assert out.loc["https://c.example/small", "status"] == "completed"
