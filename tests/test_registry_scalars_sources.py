"""Extension-surface, scalar-function, and alternative-source tests."""

import pyarrow as pa
import pytest
import ray.data as rd

from simple_content_ocr_ray.functions.scalars import (
    detect_mode,
    detect_mode_batch,
    extract_json,
    extract_json_batch,
)
from simple_content_ocr_ray.stages.engines import (
    EngineResult,
    create_engine,
    list_engines,
    register_engine,
)


def test_registry_create_and_list():
    assert "mock" in list_engines() and "html-main-content" in list_engines()
    eng = create_engine("mock")
    res = eng.extract("u", b"%PDF-1.4\n" + b"x" * 1000, "pdf")
    assert res.page_count == 1


def test_registry_unknown_engine():
    with pytest.raises(ValueError, match="Unknown engine"):
        create_engine("nope")


def test_registry_custom_engine():
    # mirrors the reference's user-extension test
    # (tests/unit/test_ocr_adapters.py:177-203)
    class UpperEngine:
        def extract(self, url, payload, content_type):
            return EngineResult(text=payload.decode(errors="replace").upper())

    register_engine("upper", UpperEngine)
    eng = create_engine("upper")
    assert eng.extract("u", b"abc", "html").text == "ABC"


def test_registry_rejects_non_callable():
    with pytest.raises(TypeError):
        register_engine("bad", "not-a-factory")


def test_remote_http_engine_is_stubbed():
    eng = create_engine("remote-http")
    with pytest.raises(NotImplementedError):
        eng.extract("u", b"x", "png")


def test_extract_json():
    assert extract_json('prefix {"a": 1} suffix') == '{"a": 1}'
    assert extract_json("no json here") is None
    t = pa.table({"text": ['x {"k": [1,2]} y', "nothing"]})
    out = extract_json_batch(t)
    assert out["json_payload"].to_pylist() == ['{"k": [1,2]}', None]


def test_detect_mode():
    assert detect_mode("extract this receipt please") == "receipt"
    assert detect_mode("Give me an INVOICE breakdown") == "invoice"
    assert detect_mode("return as json") == "json"
    assert detect_mode("just read it") == "markdown"
    t = pa.table({"text": ["parse the table", "receipt scan", "hello"]})
    out = detect_mode_batch(t)
    assert out["mode"].to_pylist() == ["table", "receipt", "markdown"]


def test_binary_files_source(tmp_path, pages_table):
    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.sources.readers import read_pages_from_binary_files

    # dump a few payloads as side files
    for i, payload in enumerate(pages_table["html"].to_pylist()[:10]):
        (tmp_path / f"doc{i:03d}.bin").write_bytes(payload)
    ds = read_pages_from_binary_files(str(tmp_path))
    assert ds.schema().names == ["url", "warc_ts", "html", "text", "lang"]
    out = extraction_pipeline(ds, concurrency=2).take_all()
    assert len(out) == 10
    assert all(r["url"].startswith("file://") for r in out)
    statuses = {r["status"] for r in out}
    assert "completed" in statuses


def test_cli_engines_and_synth(tmp_path):
    from simple_content_ocr_ray.__main__ import main

    assert main(["engines"]) == 0
    assert main(["synth", "/root/testdata/sf0.001"]) == 0


def test_bloom_filter_no_false_negatives():
    import numpy as np

    from simple_content_ocr_ray.functions.agg import BloomFilter

    rng = np.random.RandomState(3)
    members = rng.randint(0, 2**62, size=10000)
    others = rng.randint(0, 2**62, size=20000)
    bf = BloomFilter(len(members), 0.01)
    bf.add_many(members)
    assert bf.contains_many(members).all()
    assert bf.contains_many(others).mean() < 0.03


def test_bloom_semi_prefilter(sf_dir):
    import ray.data as rd

    from simple_content_ocr_ray.functions.agg import bloom_semi_prefilter

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    wanted = list(range(0, 100, 2))
    kept = bloom_semi_prefilter(docs, wanted, "doc_id").to_pandas()
    assert set(wanted) <= set(kept["doc_id"])  # no false negatives
    assert len(kept) < 200  # false positives bounded


def test_jsonl_pages_source_roundtrip(ray_session, tmp_path):
    import base64
    import json

    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.sources.readers import read_pages_from_jsonl

    html = b"<html><body><article><p>Hello JSONL world of pages</p></article></body></html>"
    rows = [
        {
            "url": "https://a.example/1",
            "warc_ts": "2024-01-02T03:04:05",
            "html_b64": base64.b64encode(html).decode(),
            "text": "",
            "lang": "en",
        },
        {"url": "https://a.example/2"},  # defaults for everything else
    ]
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    ds = read_pages_from_jsonl(str(p))
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert bytes(df.loc[0, "html"]) == html
    assert df.loc[1, "html"] == b""
    assert df.loc[0, "warc_ts"] == pd.Timestamp("2024-01-02T03:04:05")

    out = extraction_pipeline(ds).to_pandas().sort_values("url").reset_index(drop=True)
    assert out.loc[0, "status"] == "completed"
    assert "Hello JSONL world of pages" in out.loc[0, "text"]


def test_jsonl_gz_pages_source_matches_plain(ray_session, tmp_path):
    """A gzip-compressed WET-style dump parses identically to the plain
    file — decompression runs inside the distributed read tasks."""
    import base64
    import gzip
    import json

    import pandas as pd

    from simple_content_ocr_ray.sources.readers import read_pages_from_jsonl

    html = b"<html><body><article><p>Compressed crawl drop</p></article></body></html>"
    rows = [
        {
            "url": f"https://gz.example/{i}",
            "warc_ts": "2024-02-03T04:05:06",
            "html_b64": base64.b64encode(html).decode(),
            "text": "",
            "lang": "en",
        }
        for i in range(5)
    ]
    payload = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
    plain = tmp_path / "pages.jsonl"
    plain.write_bytes(payload)
    gz = tmp_path / "pages.jsonl.gz"
    gz.write_bytes(gzip.compress(payload))

    a = read_pages_from_jsonl(str(plain)).to_pandas()
    b = read_pages_from_jsonl(str(gz), compression="gzip").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("url").reset_index(drop=True),
        b.sort_values("url").reset_index(drop=True),
    )


def test_csv_pages_source_roundtrip(ray_session, tmp_path):
    import base64
    import csv

    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.sources.readers import read_pages_from_csv

    html = b"<html><body><article><p>Hello CSV world of pages</p></article></body></html>"
    p = tmp_path / "pages.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["url", "warc_ts", "html_b64", "text", "lang"])
        w.writeheader()
        w.writerow(
            {
                "url": "https://a.example/1",
                "warc_ts": "2024-01-02T03:04:05",
                "html_b64": base64.b64encode(html).decode(),
                "text": "",
                "lang": "en",
            }
        )
        w.writerow(
            {
                "url": "https://a.example/2",
                "warc_ts": "2024-01-02T03:04:06",
                "html_b64": "",
                "text": "",
                "lang": "",
            }
        )

    ds = read_pages_from_csv(str(p))
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert bytes(df.loc[0, "html"]) == html
    assert df.loc[1, "html"] == b""
    assert df.loc[0, "warc_ts"] == pd.Timestamp("2024-01-02T03:04:05")

    out = extraction_pipeline(ds).to_pandas().sort_values("url").reset_index(drop=True)
    assert out.loc[0, "status"] == "completed"
    assert "Hello CSV world of pages" in out.loc[0, "text"]


def test_compact_parquet_preserves_rows(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_content_ocr_ray.sources.compact import compact_parquet, dir_row_count

    src = tmp_path / "small"
    src.mkdir()
    for i in range(20):  # 20 tiny files of 50 rows
        t = pa.table({"k": list(range(i * 50, i * 50 + 50)), "v": ["x"] * 50})
        pq.write_table(t, src / f"part-{i:03d}.parquet")
    assert dir_row_count(str(src)) == 1000

    out = tmp_path / "compact"
    n_files = compact_parquet(str(src), str(out), target_rows=500)
    assert n_files <= 4  # ~2 target files (repartition may round)
    back = pd.read_parquet(out).sort_values("k").reset_index(drop=True)
    assert len(back) == 1000
    assert back["k"].tolist() == list(range(1000))


def test_warclite_pages_source_roundtrip(ray_session, tmp_path):
    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.sources.readers import read_pages_from_warclite

    html = b"<html><body><article><p>Hello WARC world of pages</p></article></body></html>"
    # second record's payload CONTAINS a header-lookalike — Content-Length
    # walking must not resync on it
    tricky = b"WARC/1.0\r\nnot a real header\r\n\r\n" + b"x" * 10

    def record(url, ts, payload):
        return (
            b"WARC/1.0\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )

    p = tmp_path / "segment-00000.warc"
    p.write_bytes(
        record("https://a.example/1", "2024-01-02T03:04:05Z", html)
        + record("https://a.example/2", "2024-01-02T03:04:06Z", tricky)
    )

    ds = read_pages_from_warclite(str(p))
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert len(df) == 2
    assert bytes(df.loc[0, "html"]) == html
    assert bytes(df.loc[1, "html"]) == tricky
    assert df.loc[0, "warc_ts"] == pd.Timestamp("2024-01-02T03:04:05")

    out = extraction_pipeline(ds).to_pandas().sort_values("url").reset_index(drop=True)
    assert out.loc[0, "status"] == "completed"
    assert "Hello WARC world of pages" in out.loc[0, "text"]


def test_cli_extract_real_preset(ray_session, tmp_path):
    """CLI e2e on the real-payload corpus with the default real preset:
    every non-garbage row completes through its real decoder."""
    import json

    import ray.data as rd

    from simple_content_ocr_ray.__main__ import main
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    pages = synth_pages_parquet(
        "/root/testdata/sf0.001", out_root=str(tmp_path / "pages"),
        real_payloads=True,
    )
    out = str(tmp_path / "out")
    assert main(["extract", pages, out]) == 0
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 500
    counts = back.groupby("status").size().to_dict()
    assert counts == {"completed": 475, "failed": 25}
    engines = (
        back[back["status"] == "completed"]["metadata"]
        .apply(lambda m: m["engine"]).value_counts().to_dict()
    )
    assert engines == {
        "html-main-content": 400, "pdf-text": 50, "png-decode": 25,
    }
