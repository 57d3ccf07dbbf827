"""DOM-structure template clustering (r4, pipelines/dom_templates.py)."""

import pandas as pd

from simple_content_ocr_ray.pipelines.dom_templates import (
    _N_HOSTS,
    dom_fingerprint,
    dom_template_stats,
    make_templated_page,
    template_outlier_pages,
)

SF = "/root/testdata/sf0.001"


def test_fingerprint_is_structure_only():
    # same template, different text → same hash
    a = make_templated_page(1)   # host 1, template 1, not deviant
    b = make_templated_page(1 + _N_HOSTS * 11)  # same host, different text
    assert (1 + _N_HOSTS * 11) % 11 != 0
    assert dom_fingerprint(a) == dom_fingerprint(b)
    # deviant page of the same host → different hash
    d = make_templated_page(1 + _N_HOSTS * 10)  # host 1; 231 % 11 == 0
    assert (1 + _N_HOSTS * 10) % 11 == 0
    assert dom_fingerprint(d) != dom_fingerprint(a)
    # attributes and case do not change the fingerprint
    assert dom_fingerprint(b"<DIV class='x'><P id=1>t</P></DIV>") == \
        dom_fingerprint(b"<div><p>u</p></div>")


def test_template_stats_shape(ray_session):
    stats = dom_template_stats(SF)
    assert set(stats.columns) == {"host", "tpl_hash", "n_pages"}
    per_host = stats.groupby("host").size()
    # every host has its majority template; hosts with deviant docs have 2
    assert per_host.isin([1, 2]).all()
    assert stats["n_pages"].sum() == 500


def test_outliers_are_exactly_the_deviants(ray_session):
    out = template_outlier_pages(SF)
    assert (out["doc_id"] % 11 == 0).all()
    # every deviant doc is flagged (500 docs at sf0.001 → ids 0,11,22,...)
    expected = {d for d in range(500) if d % 11 == 0}
    assert set(out["doc_id"]) == expected
    # and each flagged row's hash differs from its host's majority
    stats = dom_template_stats(SF)
    maj = (
        stats.sort_values(["host", "n_pages", "tpl_hash"],
                          ascending=[True, False, True])
        .drop_duplicates("host").set_index("host")["tpl_hash"]
    )
    assert (out["tpl_hash"] != out["host"].map(maj)).all()


def test_fingerprint_ignores_doctype_and_comments():
    assert dom_fingerprint(b"<!doctype html><!-- c --><p>x</p>") == \
        dom_fingerprint(b"<p>y</p>")
