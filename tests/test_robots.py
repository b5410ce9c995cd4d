"""RFC 9309 robots.txt parsing/evaluation: group selection, wildcard
and end-anchor rules, precedence, and tier parity."""

import pandas as pd
import pytest

from pdf_extractor_ray.ops.robots import evaluate, parse_robots, robots_allow, rule_matches

ROBOTS = """# comment line
User-agent: graftbot-news
Disallow: /news

User-agent: graftbot
User-agent: otherbot
Disallow: /private
Allow: /private/ok

User-agent: *
Disallow: /
"""


def test_group_selection_most_specific_agent():
    # exact product-token prefix: graftbot gets its shared group
    assert parse_robots(ROBOTS, "graftbot") == [
        ("disallow", "/private"),
        ("allow", "/private/ok"),
    ]
    # longer token match wins over shorter
    assert parse_robots(ROBOTS, "graftbot-news") == [("disallow", "/news")]
    # unknown agent falls back to the * group
    assert parse_robots(ROBOTS, "elsebot") == [("disallow", "/")]


def test_rules_before_any_group_ignored_and_empty_disallow():
    txt = "Disallow: /orphan\nUser-agent: *\nDisallow:\nCrawl-delay: 5\n"
    assert parse_robots(txt, "anybot") == []
    assert evaluate([], "/anything") == (True, None)


def test_wildcard_and_end_anchor():
    assert rule_matches("/a/*/c", "/a/b/c")
    assert rule_matches("/a/*/c", "/a/x/y/cz")  # prefix semantics after the span
    assert not rule_matches("/a/*/c", "/a/bc")
    assert rule_matches("/*.pdf$", "/docs/x.pdf")
    assert not rule_matches("/*.pdf$", "/docs/x.pdf?dl=1")
    assert rule_matches("/", "/anything")


def test_precedence_longest_then_allow():
    rules = [("disallow", "/en"), ("allow", "/en/doc0003")]
    assert evaluate(rules, "/en/doc0003x") == (True, "/en/doc0003")
    assert evaluate(rules, "/en/other") == (False, "/en")
    # equal length -> allow wins
    assert evaluate([("disallow", "/ja"), ("allow", "/ja")], "/ja/x") == (True, "/ja")
    # no match -> allowed
    assert evaluate(rules, "/fr/doc") == (True, None)


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    robots = pd.DataFrame(
        {
            "host": ["a.example", "b.example"],
            "robots_txt": [
                "User-agent: *\nDisallow: /x\nAllow: /x/ok\n",
                "User-agent: *\nDisallow: /*.pdf$\n",
            ],
        }
    )
    urls = pd.DataFrame(
        {
            "url": [
                "https://a.example/x/no",
                "https://a.example/x/ok/page",
                "https://a.example/free",
                "https://b.example/f.pdf",
                "https://b.example/f.pdf.html",
                "https://c.example/anything",  # no robots row -> allowed
            ]
        }
    )
    return ray.data.from_pandas(robots), ray.data.from_pandas(urls).repartition(3)


EXPECT = {
    "https://a.example/x/no": (0, "/x"),
    "https://a.example/x/ok/page": (1, "/x/ok"),
    "https://a.example/free": (1, None),
    "https://b.example/f.pdf": (0, "/*.pdf$"),
    "https://b.example/f.pdf.html": (1, None),
    "https://c.example/anything": (1, None),
}


@pytest.mark.parametrize("tier", ["broadcast", "coshuffle"])
def test_robots_allow_tiers_agree(corpus, tier):
    robots, urls = corpus
    out = robots_allow(robots, urls, tier=tier, num_partitions=4).to_pandas()
    got = {
        r.url: (int(r.allowed), None if pd.isna(r.matched_rule) else r.matched_rule)
        for r in out.itertuples()
    }
    assert got == EXPECT


# --- HITS (ops/linkgraph.py) -------------------------------------------------


def _edges_ds(ray_session, rows):
    import pandas as pd
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["src_host", "dst_host", "n"])
    ).repartition(3)


def test_hits_star_graph(ray_session):
    """Hubs point, authorities are pointed at: in a star with all
    edges into 'center', spokes are pure hubs and center the pure
    authority."""
    from pdf_extractor_ray.ops.linkgraph import hits

    rows = [(f"s{i}", "center", 1) for i in range(4)]
    out = hits(_edges_ds(ray_session, rows), n_iters=10).to_pandas().set_index("host")
    assert out.loc["center", "authority"] == pytest.approx(1.0)
    assert out.loc["center", "hub"] == pytest.approx(0.0)
    for i in range(4):
        assert out.loc[f"s{i}", "hub"] == pytest.approx(0.5)  # 4 equal hubs, L2=1
        assert out.loc[f"s{i}", "authority"] == pytest.approx(0.0)


def test_hits_tiers_agree(ray_session):
    import numpy as np

    from pdf_extractor_ray.ops.linkgraph import hits

    rows = [
        ("a", "b", 2), ("a", "c", 1), ("b", "c", 3), ("c", "a", 1),
        ("d", "c", 2), ("d", "b", 1), ("b", "d", 1),
    ]
    ds = _edges_ds(ray_session, rows)
    local = hits(ds, n_iters=15).to_pandas().sort_values("host").reset_index(drop=True)
    streamed = (
        hits(ds, n_iters=15, broadcast_max_edges=0)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert local["host"].tolist() == streamed["host"].tolist()
    assert np.allclose(local["hub"], streamed["hub"], atol=1e-12)
    assert np.allclose(local["authority"], streamed["authority"], atol=1e-12)


def test_duplicate_groups_combine():
    """RFC 9309 §2.2.1: rules of ALL matching groups combine."""
    txt = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    assert parse_robots(txt, "anybot") == [("disallow", "/a"), ("disallow", "/b")]
    assert evaluate(parse_robots(txt, "x"), "/b/x") == (False, "/b")


def test_nongroup_lines_are_transparent():
    """Sitemap/Crawl-delay between User-agent lines neither ends the
    agent run nor splits the group."""
    txt = "User-agent: a\nSitemap: https://x/s.xml\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(txt, "a") == [("disallow", "/x")]
    assert parse_robots(txt, "b") == [("disallow", "/x")]
