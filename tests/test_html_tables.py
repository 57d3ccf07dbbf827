"""HTML table structure extractor: parser edge cases + e2e stage."""

import pandas as pd

from simple_content_ocr_ray.stages.html_tables import TableExtractStage, extract_tables


def test_basic_grid():
    t = extract_tables("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
    assert t == [[[(0, "a"), (1, "b")], [(0, "c")]]]


def test_implicit_closes():
    # real-world tables omit </td> and </tr> constantly
    t = extract_tables("<table><tr><td>a<td>b<tr><td>c</table>")
    assert t == [[[(0, "a"), (1, "b")], [(0, "c")]]]


def test_colspan_advances_grid():
    t = extract_tables('<table><tr><td>a</td><td colspan="3">wide</td><td>b</td></tr></table>')
    assert t == [[[(0, "a"), (1, "wide"), (4, "b")]]]


def test_nested_table_text_belongs_to_inner():
    html = (
        "<table><tr><td>outer-before"
        "<table><tr><td>inner</td></tr></table>"
        "outer-after</td></tr></table>"
    )
    tables = extract_tables(html)
    assert len(tables) == 2
    # document order: the OUTER table opened first
    assert tables[0] == [[(0, "outer-before outer-after")]]
    assert tables[1] == [[(0, "inner")]]


def test_script_and_style_decoys_skipped():
    html = (
        '<script>var x = "<table><tr><td>no</td></tr></table>";</script>'
        "<style>td:before{content:'<td>'}</style>"
        "<table><tr><td>yes</td></tr></table>"
    )
    assert extract_tables(html) == [[[(0, "yes")]]]


def test_attr_with_gt_and_entities_and_markup():
    html = '<table summary="a>b"><tr><td><b>x &amp; y</b> &lt;z&gt;</td></tr></table>'
    assert extract_tables(html) == [[[(0, "x & y <z>")]]]


def test_unclosed_table_at_eof():
    assert extract_tables("<p>x</p><table><tr><td>tail") == [[[(0, "tail")]]]


def test_td_without_tr_gets_implicit_row():
    assert extract_tables("<table><td>a<td>b</table>") == [[[(0, "a"), (1, "b")]]]


def test_whitespace_collapse():
    assert extract_tables("<table><tr><td>  a\n\t b  </td></tr></table>") == [
        [[(0, "a b")]]
    ]


def test_no_tables():
    assert extract_tables("<html><body><p>nothing here</p></body></html>") == []


def test_stage_emits_grid_rows():
    df = pd.DataFrame(
        {
            "url": ["u1", "u2"],
            "html": [
                b"<table><tr><td>a</td><td>b</td></tr></table>",
                b"<p>none</p>",
            ],
        }
    )
    out = TableExtractStage()(df)
    assert list(out.columns) == ["url", "table_idx", "row_idx", "col_idx", "cell"]
    assert len(out) == 2
    assert set(out["url"]) == {"u1"}
    assert list(out["cell"]) == ["a", "b"]
