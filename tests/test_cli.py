"""CLI surface tests: extract -> stats/report over a tiny corpus,
exercised in-process against the shared session (the CLI must not
shut down a Ray session it did not create)."""

import csv
import json
import os


def test_cli_extract_stats_report(ray_session, tmp_path, capsys):
    from pdf_extractor_ray import cli
    from pdf_extractor_ray.fixtures.generator import write_corpus

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    pages, _ = write_corpus(corpus, 60, seed=7)

    assert cli.main(["extract", "-i", pages, "-o", out]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_written"] > 0

    assert cli.main(["stats", "-i", out]) == 0
    roll = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(r["n_docs"] for r in roll["by_lang"]) == stats["rows_written"]

    rep = str(tmp_path / "report")
    assert cli.main(["report", "-i", out, "-o", rep, "--limit", "10"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["summary"]["n_docs"] == stats["rows_written"]
    assert 0 < meta["top_rows"] <= 10

    with open(rep + ".csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == meta["top_rows"]
    scores = [float(r["quality_score"]) for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert rows[0]["url"] == meta["summary"]["best_url"]

    html = open(rep + ".html", encoding="utf-8").read()
    assert "<table" in html and rows[0]["url"] in html

    # the CLI must leave the shared session alive
    import ray

    assert ray.is_initialized()

    # resume probe through the CLI: second run writes nothing
    assert cli.main(["extract", "-i", pages, "-o", out]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["rows_written"] == 0
    assert stats2["urls_skipped_resume"] > 0


def test_cli_gen_writes_fixture(tmp_path, capsys):
    from pdf_extractor_ray import cli

    assert cli.main(["gen", "-o", str(tmp_path / "g"), "-n", "30"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(meta["pages"]) and os.path.exists(meta["golden"])


def test_cli_verify(ray_session, tmp_path, capsys):
    """`cli verify` rolls up issues by type via a distributed grouped
    count and optionally sinks per-url rows to parquet."""
    from pdf_extractor_ray import cli
    from pdf_extractor_ray.fixtures.generator import write_corpus

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    pages, _ = write_corpus(corpus, 40, seed=9)
    assert cli.main(["extract", "-i", pages, "-o", out]) == 0
    capsys.readouterr()

    assert cli.main(["verify", "-i", out]) == 0
    roll = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert roll["backend"] == "heuristic" and roll["n_docs"] > 0
    assert roll["n_flagged"] >= 0 and isinstance(roll["issues_by_type"], dict)

    sink = str(tmp_path / "verified")
    assert cli.main(["verify", "-i", out, "--backend", "ngram", "-o", sink]) == 0
    roll2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert roll2["backend"] == "ngram" and roll2["out"] == sink
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(sink, "*.parquet"))
    assert files
    cols = pq.read_schema(files[0]).names
    assert {"url", "n_issues", "issues", "verifier_confidence"} <= set(cols)


def test_cli_export(ray_session, tmp_path, capsys):
    """`cli export` shards an extracted corpus deterministically with
    _SUCCESS markers and skips completed shards on re-run."""
    from pdf_extractor_ray import cli
    from pdf_extractor_ray.fixtures.generator import write_corpus

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    shards = str(tmp_path / "shards")
    pages, _ = write_corpus(corpus, 40, seed=9)
    assert cli.main(["extract", "-i", pages, "-o", out]) == 0
    capsys.readouterr()

    assert cli.main(["export", "-i", out, "-o", shards, "--shards", "4"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    assert summary["shards_written"] == 4 and summary["rows"] > 0
    for s in range(4):
        assert os.path.exists(os.path.join(shards, f"shard={s:05d}", "_SUCCESS"))
    # resume: nothing to do
    assert cli.main(["export", "-i", out, "-o", shards, "--shards", "4"]) == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2 == {"shards_written": 0, "rows": 0}


def test_cli_export_wet(ray_session, tmp_path, capsys):
    """`cli export --format wet` writes WET-style WARC shards of the
    extracted text through the distributed datasink; records read back
    byte-identically."""
    from pdf_extractor_ray import cli
    from pdf_extractor_ray.fixtures.generator import write_corpus
    from pdf_extractor_ray.sources.warc import read_warc

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    wet = str(tmp_path / "wet")
    pages, _ = write_corpus(corpus, 30, seed=9)
    assert cli.main(["extract", "-i", pages, "-o", out]) == 0
    capsys.readouterr()

    assert cli.main(["export", "-i", out, "-o", wet, "--format", "wet"]) == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["num_rows"] >= 30
    import glob

    shards = sorted(glob.glob(os.path.join(wet, "*.warc.gz")))
    assert shards and os.path.exists(os.path.join(wet, "_SUCCESS"))
    got = read_warc(shards).to_pandas()
    assert len(got) == manifest["num_rows"]
    import pandas as pd

    import ray.data

    want = ray.data.read_parquet(out, file_extensions=["parquet"]).to_pandas()
    m = got.merge(want[["url", "extracted_text"]], on="url")
    assert (m["html"] == m["extracted_text"].str.encode("utf-8")).all()
