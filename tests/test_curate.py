"""curate_at_scale: composed-flagship reconciliation, near-dup collapse,
WET roundtrip."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from simple_content_ocr_ray.sources.synth_pages import (
    PAGES_SCHEMA,
    _HTML_TEMPLATE,
)

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango"
)


def _html(d: int, text: str) -> bytes:
    return _HTML_TEMPLATE.format(
        doc_id=d, host=d % 97, lang="en", body=f"<p>{text}</p>"
    ).encode()


def _pages_dir(tmp_path) -> str:
    base = WORDS  # 20 distinct words, passes every quality rule
    rows = [
        # docs 1 and 2: near-dups (doc 2 drops the last two words → high J)
        (1, _html(1, base)),
        (2, _html(2, " ".join(base.split(" ")[:-2]))),
        # docs 3/4: exact dups of each other (different urls, same text),
        # zero shingle overlap with the base words
        (3, _html(3, "one two three four five six seven eight nine ten "
                     "eleven twelve thirteen fourteen fifteen sixteen")),
        (4, _html(4, "one two three four five six seven eight nine ten "
                     "eleven twelve thirteen fourteen fifteen sixteen")),
        # doc 5: independent keeper
        (5, _html(5, " ".join(reversed(base.split(" "))) + " zulu yankee")),
        # doc 6: quality-dropped (too short)
        (6, _html(6, "tiny doc")),
        # doc 7: garbage → failed row
        (7, b"GARBAGE\x00nope"),
    ]
    t = pa.Table.from_arrays(
        [
            pa.array([f"https://c.example/{d:08d}" for d, _ in rows]),
            pa.array([0] * len(rows), pa.timestamp("us")),
            pa.array([p for _, p in rows], pa.binary()),
            pa.array([""] * len(rows)),
            pa.array(["en"] * len(rows)),
        ],
        schema=PAGES_SCHEMA,
    )
    d = str(tmp_path / "pages")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "part0.parquet"))
    return d


def test_curate_at_scale_stages_and_wet_roundtrip(tmp_path, ray_session):
    from simple_content_ocr_ray.pipelines.curate import curate_at_scale
    from simple_content_ocr_ray.sources.readers import read_pages_from_warc

    out = curate_at_scale(_pages_dir(tmp_path), str(tmp_path / "out"))
    rep = out["report"].set_index("stage")["n"]
    assert rep["pages_in"] == 7
    assert rep["completed"] == 6      # garbage failed
    assert rep["html_text"] == 6
    assert rep["quality_kept"] == 5   # tiny doc dropped
    assert rep["exact_keepers"] == 4  # 3/4 collapse
    assert rep["near_dup_keepers"] == 3  # 1/2 collapse
    assert rep["sequences"] >= 1
    assert rep["packed_tokens"] == 20 + 16 + 22  # keepers 1, 3, 5
    assert rep["wet_records"] == 3

    # WET shards round-trip through the WARC reader with the keeper texts
    wet_dir = str(tmp_path / "out" / "wet")
    back = read_pages_from_warc(wet_dir).to_pandas()
    assert len(back) == 3
    texts = set(bytes(h).decode() for h in back["html"])
    assert WORDS in texts  # keeper of the near-dup pair is doc 1 (min key)


def test_curate_report_deterministic_across_partitionings(
    tmp_path, ray_session
):
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.curate import curate_at_scale

    pages = _pages_dir(tmp_path)
    a = curate_at_scale(pages, str(tmp_path / "o1"))["report"]
    b = curate_at_scale(pages, str(tmp_path / "o2"), batch_size=2)["report"]
    pd.testing.assert_frame_equal(a, b)


def test_curate_stage_a_resumes_without_reextraction(tmp_path, ray_session, monkeypatch):
    """r5: a rerun over the same input + params skips the extraction pass
    (stage A) and re-derives downstream stages from the on-disk annotated
    table — byte-identical report."""
    from simple_content_ocr_ray.pipelines import curate as curate_mod

    pages = _pages_dir(tmp_path)
    out = str(tmp_path / "out")
    first = curate_mod.curate_at_scale(pages, out)["report"]

    calls = {"n": 0}
    orig = curate_mod._make_annotate

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(curate_mod, "_make_annotate", spy)
    second = curate_mod.curate_at_scale(pages, out)["report"]
    assert calls["n"] == 0  # stage A skipped entirely
    pd.testing.assert_frame_equal(first, second)

    # changed quality params invalidate the marker → stage A reruns
    curate_mod.curate_at_scale(pages, out, min_tokens=1)
    assert calls["n"] == 1


def test_curate_forced_large_path_equals_small(tmp_path, ray_session):
    """r5: small_threshold=0 forces the distributed keeper path (Dataset
    join semi-filter, distributed pack prefix-scan, anti-filter WET) —
    report must equal the driver-bounded small path exactly."""
    from simple_content_ocr_ray.pipelines.curate import curate_at_scale

    pages = _pages_dir(tmp_path)
    small = curate_at_scale(pages, str(tmp_path / "s"))["report"]
    large = curate_at_scale(
        pages, str(tmp_path / "l"), small_threshold=0
    )["report"]
    pd.testing.assert_frame_equal(small, large)
