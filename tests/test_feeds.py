"""Sitemap / RSS / Atom parsers and their Dataset ops."""

from datetime import datetime

import pytest

from pdf_extractor_ray.fixtures.feedgen import feed_corpus_table
from pdf_extractor_ray.ops.feeds import (
    _parse_rfc822,
    parse_feed,
    parse_sitemap,
    feed_items,
    sitemap_entries,
)


def test_urlset_with_optional_fields():
    sm = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url><loc>https://h/p1</loc><lastmod>2024-01-05</lastmod>
         <changefreq>daily</changefreq><priority>0.5</priority></url>
    <url><loc>https://h/p2</loc></url>
    <url><lastmod>2024-01-09</lastmod></url>
    </urlset>"""
    got = parse_sitemap(sm)
    # entry without <loc> is void per the protocol
    assert got == [
        ("urlset", "https://h/p1", datetime(2024, 1, 5), "daily", 0.5),
        ("urlset", "https://h/p2", None, None, None),
    ]


def test_sitemapindex_and_datetime_lastmod():
    sm = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <sitemap><loc>https://h/a.xml</loc><lastmod>2024-02-01T06:30:03Z</lastmod></sitemap>
    </sitemapindex>"""
    assert parse_sitemap(sm) == [
        ("sitemapindex", "https://h/a.xml", datetime(2024, 2, 1, 6, 30, 3), None, None)
    ]


def test_non_sitemap_xml_raises():
    with pytest.raises(ValueError, match="not a sitemap root"):
        parse_sitemap("<html><body>x</body></html>")


def test_rss_scopes_channel_title_out():
    rss = """<rss version="2.0"><channel><title>CHANNEL</title>
    <item><title>Post 1</title><link>https://h/a</link>
          <pubDate>Mon, 01 Jan 2024 13:05:00 GMT</pubDate></item>
    <item><title>Post 2</title><link>https://h/b</link></item>
    </channel></rss>"""
    got = parse_feed(rss)
    assert got == [
        ("rss", "Post 1", "https://h/a", datetime(2024, 1, 1, 13, 5)),
        ("rss", "Post 2", "https://h/b", None),
    ]


def test_atom_link_href_and_updated():
    atom = """<feed xmlns="http://www.w3.org/2005/Atom"><title>FEED</title>
    <entry><title>E1</title><link href="https://h/n1"/>
           <updated>2024-04-02T03:05:00Z</updated></entry>
    </feed>"""
    assert parse_feed(atom) == [("atom", "E1", "https://h/n1", datetime(2024, 4, 2, 3, 5))]


def test_rfc822_is_strict():
    assert _parse_rfc822("Mon, 01 Jan 2024 13:05:00 GMT") == datetime(2024, 1, 1, 13, 5)
    assert _parse_rfc822("01 Jan 2024 13:05:00 GMT") is None  # missing weekday
    assert _parse_rfc822("Mon, 01 Janv 2024 13:05:00 GMT") is None  # locale-ish month
    assert _parse_rfc822("Mon, 01 Jan 2024 13:05:00 +0000") is None  # non-GMT zone


def test_dataset_ops_over_fixture_corpus(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    path = str(tmp_path / "feeds.parquet")
    pq.write_table(feed_corpus_table(), path)
    ds = ray.data.read_parquet(path)

    sm = sitemap_entries(ds, xml_col="xml").to_pandas()
    # non-sitemap XML (feeds) routed through the parser yield error
    # rows; the dedicated queries pre-filter by url — here we check
    # the op's own error contract instead
    kinds = set(sm["kind"])
    assert kinds == {"urlset", "sitemapindex", "error"}
    assert (sm[sm["kind"] == "error"]["loc"].isna()).all()
    n_urlset = sum(8 + i % 5 for i in range(8))
    assert (sm["kind"] == "urlset").sum() == n_urlset
    assert (sm["kind"] == "sitemapindex").sum() == 8

    fi = feed_items(ds, xml_col="xml").to_pandas()
    assert (fi["kind"] == "rss").sum() == 8 * 5
    assert (fi["kind"] == "atom").sum() == 8 * 4
    assert fi[fi["kind"] == "rss"]["pub_ts"].notna().all()
    assert fi[fi["kind"] == "atom"]["link"].str.startswith("https://host").all()


def test_crawl_frontier_composition(ray_session, tmp_path):
    """sitemap locs -> robots gate, hints carried: hosts with
    'Disallow: /' yield allowed=0 for every loc; robots-less hosts
    default-allow; longer Allow overrides the section Disallow."""
    import pyarrow.parquet as pq
    import ray.data

    from pdf_extractor_ray.fixtures.feedgen import feed_corpus_table, robots_corpus_table
    from pdf_extractor_ray.ops.feeds import sitemap_entries
    from pdf_extractor_ray.ops.robots import robots_allow

    fp = str(tmp_path / "feeds.parquet")
    rp = str(tmp_path / "robots.parquet")
    pq.write_table(feed_corpus_table(), fp)
    pq.write_table(robots_corpus_table(), rp)

    sm = sitemap_entries(ray.data.read_parquet(fp), xml_col="xml").to_pandas()
    locs = sm[sm["kind"] == "urlset"][["loc"]].rename(columns={"loc": "url"})
    out = robots_allow(
        ray.data.read_parquet(rp), ray.data.from_pandas(locs.reset_index(drop=True))
    ).to_pandas()
    assert len(out) == len(locs)
    # host1 (i%4==1): Disallow: / -> everything blocked
    h1 = out[out["host"] == "host1.example"]
    assert len(h1) and (h1["allowed"] == 0).all()
    # host0/host4 (i%4==0): no robots row -> default allow
    h0 = out[out["host"].isin(["host0.example", "host4.example"])]
    assert len(h0) and (h0["allowed"] == 1).all() and h0["matched_rule"].isna().all()
    # host2 (i%4==2): Disallow /p00 with Allow /p002 override
    h2 = out[out["host"] == "host2.example"].set_index("url")
    assert h2.loc["https://host2.example/p002", "allowed"] == 1
    assert h2.loc["https://host2.example/p000", "allowed"] == 0
