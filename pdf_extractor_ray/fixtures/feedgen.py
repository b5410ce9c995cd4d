"""Deterministic crawl-frontier fixture corpus: XML sitemaps (urlset +
sitemapindex), RSS 2.0 and Atom feeds, plus malformed payloads for the
error-row contract. No RNG — every byte derives from loop indices, so
the corpus (and therefore the oracle hashes) is stable run-to-run.

Layout notes the oracles rely on:
- each entry element (<url>/<sitemap>/<item>/<entry>) is emitted on
  ONE line with no nested markup in field values, so the DuckDB twins
  can re-extract fields with non-greedy regexes;
- malformed docs contain NONE of the root markers ('<urlset',
  '<sitemapindex', '<rss', '<feed') so the twins can route them to
  kind='error' rows with a LIKE predicate;
- RSS pubDate weekday names are computed from the real date with a
  hard-coded English table (never %a — locale trap, see ops/feeds.py).
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa

_DAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_CHANGEFREQS = ["daily", "weekly", "monthly"]

N_HOSTS = 8


def _rfc822(dt: datetime) -> str:
    return (
        f"{_DAYS[dt.weekday()]}, {dt.day:02d} {_MONTHS[dt.month - 1]} {dt.year} "
        f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d} GMT"
    )


def _urlset(i: int) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>']
    lines.append('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
    for j in range(8 + i % 5):
        parts = [f"<loc>https://host{i}.example/p{j:03d}</loc>"]
        if (i + j) % 4 != 0:
            parts.append(f"<lastmod>2024-01-{1 + (i * 7 + j) % 28:02d}</lastmod>")
        if (i + j) % 5 != 0:
            parts.append(f"<changefreq>{_CHANGEFREQS[(i + j) % 3]}</changefreq>")
        if (i + j) % 3 != 0:
            parts.append(f"<priority>{((i + j) % 10) / 10:.1f}</priority>")
        lines.append("<url>" + "".join(parts) + "</url>")
    lines.append("</urlset>")
    return "\n".join(lines)


def _sitemapindex(k: int) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>']
    lines.append('<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
    for i in range(4 * k, 4 * k + 4):
        lines.append(
            f"<sitemap><loc>https://host{i}.example/sitemap.xml</loc>"
            f"<lastmod>2024-02-{k + 1:02d}T06:30:0{i % 10}Z</lastmod></sitemap>"
        )
    lines.append("</sitemapindex>")
    return "\n".join(lines)


def _rss(i: int) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>']
    lines.append(f'<rss version="2.0"><channel><title>Host {i} blog</title>')
    lines.append(f"<link>https://host{i}.example/</link>")
    for j in range(5):
        dt = datetime(2024, 3, 1 + (i + j) % 28, (i * 5 + j) % 24, 15, j % 60)
        lines.append(
            f"<item><title>Post {i}-{j}</title>"
            f"<link>https://host{i}.example/blog/{j}</link>"
            f"<pubDate>{_rfc822(dt)}</pubDate></item>"
        )
    lines.append("</channel></rss>")
    return "\n".join(lines)


def _atom(i: int) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>']
    lines.append('<feed xmlns="http://www.w3.org/2005/Atom">')
    lines.append(f"<title>Host {i} atom</title>")
    for j in range(4):
        lines.append(
            f"<entry><title>Entry {i}-{j}</title>"
            f'<link href="https://host{i}.example/notes/{j}"/>'
            f"<updated>2024-04-{1 + (i * 3 + j) % 28:02d}T{(j * 7 + i) % 24:02d}:05:00Z</updated>"
            f"</entry>"
        )
    lines.append("</feed>")
    return "\n".join(lines)


def feed_corpus_table() -> "pa.Table":
    """(url, xml) corpus: one urlset per host, two sitemapindexes, one
    RSS + one Atom feed per host, and two malformed payloads (one
    routed to each parser by url shape)."""
    urls: list[str] = []
    xmls: list[str] = []
    for i in range(N_HOSTS):
        urls.append(f"https://host{i}.example/sitemap.xml")
        xmls.append(_urlset(i))
    for k in range(2):
        urls.append(f"https://hub{k}.example/sitemapindex.xml")
        xmls.append(_sitemapindex(k))
    for i in range(N_HOSTS):
        urls.append(f"https://host{i}.example/rss.xml")
        xmls.append(_rss(i))
        urls.append(f"https://host{i}.example/atom.xml")
        xmls.append(_atom(i))
    urls.append("https://bad0.example/sitemap.xml")
    xmls.append("MALFORMED {not xml at all")
    urls.append("https://bad1.example/rss.xml")
    xmls.append("<html><body>an html page served at a feed url</body></html>")
    return pa.table({"url": pa.array(urls, pa.string()), "xml": pa.array(xmls, pa.string())})


def robots_corpus_table(n_hosts: int = 40) -> "pa.Table":
    """(host, robots_txt) fixture for the SQL-oracled robots query:
    single-group ('User-agent: *' only), wildcard-free rules so a
    DuckDB window query can reproduce longest-match + allow-tie +
    default-allow exactly. Hosts follow the pages fixture's
    site{i}.example naming; i % 7 == 0 hosts get NO robots row at all
    (default allow). Group selection / '*' / '$' semantics live in
    unit-test fixtures instead (ops/robots.py docstring)."""
    hosts: list[str] = []
    txts: list[str] = []
    # host{i}.example groups (the sitemap/feed fixture's hosts) — lets
    # the crawl-frontier composition query evaluate sitemap locs
    # against per-host rules; wildcard-free so the composed twin works
    for i in range(N_HOSTS):
        m = i % 4
        if m == 0:
            continue  # no robots.txt -> default allow
        lines = ["User-agent: *"]
        if m == 1:
            lines.append("Disallow: /")
        elif m == 2:
            lines += ["Disallow: /p00", f"Allow: /p00{i % 10}"]
        else:  # m == 3: empty Disallow -> allow all
            lines.append("Disallow:")
        hosts.append(f"host{i}.example")
        txts.append("\n".join(lines) + "\n")
    for i in range(n_hosts):
        if i % 7 == 0:
            continue  # no robots.txt for this host
        lines = ["# synthetic robots fixture", "User-agent: *"]
        m = i % 7
        if m == 1:
            lines.append("Disallow: /")
        elif m == 2:
            lines.append("Disallow: /ja")
        elif m == 3:
            lines += ["Disallow: /en", f"Allow: /en/doc{i:04d}"]
        elif m == 4:
            lines += ["Allow: /", "Disallow: /ja"]
        elif m == 5:
            lines += ["Disallow:", "Crawl-delay: 2"]  # empty Disallow = allow all
        else:  # m == 6: equal-length allow/disallow tie -> allow wins
            lines += ["Disallow: /ja", "Allow: /ja"]
        hosts.append(f"site{i}.example")
        txts.append("\n".join(lines) + "\n")
    return pa.table(
        {"host": pa.array(hosts, pa.string()), "robots_txt": pa.array(txts, pa.string())}
    )
