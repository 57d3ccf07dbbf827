"""robots.txt parsing + RFC 9309 precedence (pipelines/extract_queries.py)."""

from __future__ import annotations

from simple_content_ocr_ray.pipelines.extract_queries import (
    parse_robots,
    robots_allows,
)


def test_longest_match_allow_beats_shorter_disallow():
    rules = parse_robots(b"User-agent: *\nDisallow: /rel/\nAllow: /rel/2\n")
    assert robots_allows(rules, "/rel/1") is False
    assert robots_allows(rules, "/rel/2") is True
    assert robots_allows(rules, "/other") is True


def test_allow_wins_length_ties():
    rules = parse_robots(b"User-agent: *\nDisallow: /a\nAllow: /a\n")
    assert robots_allows(rules, "/a/page") is True


def test_groups_scope_to_their_agents():
    raw = (
        b"User-agent: googlebot\nDisallow: /private\n\n"
        b"User-agent: *\nDisallow: /login\n"
    )
    rules = parse_robots(raw)
    assert robots_allows(rules, "/private") is True  # googlebot-only rule
    assert robots_allows(rules, "/login") is False


def test_multi_agent_group_including_star():
    raw = b"User-agent: botA\nUser-agent: *\nDisallow: /x\n"
    rules = parse_robots(raw)
    assert robots_allows(rules, "/x/1") is False


def test_comments_blank_disallow_and_wildcards():
    raw = (
        b"# top comment\nUser-agent: *\n"
        b"Disallow:   # empty = allow all\n"
        b"Disallow: /tmp/*/x\n"  # wildcard pattern: ignored (documented)
        b"Disallow: /real\n"
    )
    rules = parse_robots(raw)
    assert robots_allows(rules, "/anything") is True
    assert robots_allows(rules, "/real/page") is False


def test_empty_and_garbage_robots_allow_everything():
    assert robots_allows(parse_robots(b""), "/any") is True
    assert robots_allows(parse_robots(b"\x00\xff not a robots file"), "/any") is True


def test_sitemap_lines_do_not_disturb_groups():
    """Sitemap is a non-group directive: it must neither close the open
    agent group nor leak into the rules."""
    raw = (
        b"User-agent: *\n"
        b"Sitemap: https://a.example/sitemap.xml\n"
        b"Disallow: /login\n"
    )
    rules = parse_robots(raw)
    assert robots_allows(rules, "/login") is False  # group stayed open


def test_robots_sitemaps_extraction():
    from simple_content_ocr_ray.pipelines.extract_queries import (
        robots_sitemaps,
    )

    raw = (
        b"Sitemap: https://a.example/sitemap.xml\n"
        b"User-agent: *\nDisallow: /x\n"
        b"sitemap: https://a.example/news.xml  # comment\n"
        b"Sitemap:\n"  # empty value: ignored
    )
    assert robots_sitemaps(raw) == [
        "https://a.example/sitemap.xml",
        "https://a.example/news.xml",
    ]


def test_robots_wildcard_patterns():
    """RFC 9309 §2.2.3 special characters: * spans octets, trailing $
    anchors, interior $ is literal; backtracking finds a valid split."""
    from simple_content_ocr_ray.pipelines.extract_queries import (
        parse_robots,
        robots_allows,
    )

    rules = parse_robots(
        b"User-agent: *\n"
        b"Disallow: /dl/*.zip$\n"
        b"Disallow: /tmp*\n"
        b"Allow: /tmp/keep\n"
    )
    assert robots_allows(rules, "/dl/a.zip") is False
    assert robots_allows(rules, "/dl/a.zip.html") is True  # $ anchor
    # backtracking: the .zip suffix is at the END, an earlier .zip inside
    # the path must not defeat the match
    assert robots_allows(rules, "/dl/a.zip/b.zip") is False
    assert robots_allows(rules, "/tmp/cache") is False
    # octet-count precedence: Allow /tmp/keep (9) beats Disallow /tmp* (5)
    assert robots_allows(rules, "/tmp/keep/x") is True
    assert robots_allows(rules, "/other") is True


def test_robots_wildcard_octet_precedence_tie():
    from simple_content_ocr_ray.pipelines.extract_queries import (
        robots_allows,
    )

    # equal octet counts: Allow wins the tie
    rules = [(False, "/a/*/b"), (True, "/a/x/b")]
    assert robots_allows(rules, "/a/x/b") is True
    # interior $ is a literal octet, not an anchor
    rules = [(False, "/x$y*")]
    assert robots_allows(rules, "/x$y123") is False
    assert robots_allows(rules, "/xy123") is True


def test_parse_crawl_delay_group_semantics():
    from simple_content_ocr_ray.pipelines.extract_queries import (
        parse_crawl_delay,
    )

    # star group carries the delay; the googlebot group's value is ignored
    raw = (b"User-agent: googlebot\nCrawl-delay: 30\n\n"
           b"User-agent: *\nCrawl-delay: 7\nDisallow: /x\n")
    assert parse_crawl_delay(raw) == 7
    # no star group → None
    assert parse_crawl_delay(b"User-agent: googlebot\nCrawl-delay: 5\n") is None
    # fractional values floor; junk ignored
    assert parse_crawl_delay(b"User-agent: *\nCrawl-delay: 2.5\n") == 2
    assert parse_crawl_delay(b"User-agent: *\nCrawl-delay: soon\n") is None
    # shared group line: either agent opens the group
    raw2 = b"User-agent: a\nUser-agent: *\nCrawl-delay: 3\n"
    assert parse_crawl_delay(raw2) == 3
