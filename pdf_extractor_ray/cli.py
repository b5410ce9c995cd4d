"""CLI entry points (the reference's main.py:33-82 /
professional_runner.py:123-165 surface, re-expressed for a Dataset
engine). This module OWNS a Ray session (guarded); library code never
does.

    python -m pdf_extractor_ray.cli extract -i pages.parquet -o /tmp/out
    python -m pdf_extractor_ray.cli stats   -i /tmp/out
    python -m pdf_extractor_ray.cli report  -i /tmp/out -o /tmp/report
    python -m pdf_extractor_ray.cli verify  -i /tmp/out [--backend ngram]
    python -m pdf_extractor_ray.cli gen     -o /tmp/corpus -n 5000 [--fat 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int | None):
    """Returns (ray, owned): owned=False when a session already exists
    (embedding caller / pytest fixture) — then we must NOT shut it
    down on exit."""
    import ray

    if ray.is_initialized():
        return ray, False
    kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
    if num_cpus:
        kw["num_cpus"] = num_cpus
    ray.init(**kw)
    return ray, True


def cmd_extract(args: argparse.Namespace) -> int:
    ray, owned = _ray_session(args.num_cpus)
    try:
        from pdf_extractor_ray.config import DEFAULT_CONFIG
        from pdf_extractor_ray.pipelines.extract import run_extraction, run_extraction_sharded

        cfg = DEFAULT_CONFIG
        if args.concurrency:
            cfg = cfg.with_overrides(concurrency=args.concurrency)
        if args.sharded:
            stats = run_extraction_sharded(
                args.input, args.output, cfg=cfg, files_per_shard=args.files_per_shard
            )
        else:
            stats = run_extraction(args.input, args.output, cfg=cfg, resume=not args.no_resume)
        print(json.dumps(stats))
        return 0
    finally:
        if owned:
            ray.shutdown()


def cmd_stats(args: argparse.Namespace) -> int:
    """Corpus rollup over an extracted output dir (groupby-lang +
    grade histogram; reference report S5, processor.py:139-171)."""
    ray, owned = _ray_session(args.num_cpus)
    try:
        import ray.data
        from ray.data.aggregate import Count, Mean, Sum

        ds = ray.data.read_parquet(args.input, file_extensions=["parquet"])
        by_lang = (
            ds.groupby("lang")
            .aggregate(Count(alias_name="n_docs"), Sum("n_words", alias_name="total_words"), Mean("quality_score", alias_name="avg_quality"))
            .to_pandas()
        )
        by_grade = ds.groupby("grade").aggregate(Count(alias_name="n")).to_pandas()
        print(json.dumps({"by_lang": by_lang.to_dict("records"), "by_grade": by_grade.to_dict("records")}, default=str))
        return 0
    finally:
        if owned:
            ray.shutdown()


def cmd_report(args: argparse.Namespace) -> int:
    """Quality-ranking report sinks (reference S6,
    batch_processor.py:320-362): a CSV ranking table and/or a
    self-contained HTML page, plus a summary row (totals, success
    rate, avg quality, best/worst url).

    The ranking is a distributed sort + limit — only the top-N rows
    ever reach the driver, so the report stays cheap at corpus scale;
    the summary is a Dataset aggregate."""
    ray, owned = _ray_session(args.num_cpus)
    try:
        import pandas as pd
        import ray.data
        from ray.data.aggregate import Count, Mean

        cols = ["url", "lang", "n_words", "quality_score", "grade", "error"]
        ds = ray.data.read_parquet(args.input, columns=cols, file_extensions=["parquet"])
        ranked = ds.sort(["quality_score", "url"], descending=[True, False])
        top = pd.DataFrame(ranked.limit(args.limit).take_all())[cols]
        agg = ds.aggregate(Count(alias_name="n_docs"), Mean("quality_score", alias_name="avg_quality"))

        def _count_failed(b: "pd.DataFrame") -> "pd.DataFrame":
            bad = (~b["error"].isna()) & (b["error"] != "")
            return pd.DataFrame({"n_failed": [int(bad.sum())]})

        n_failed = int(
            ds.map_batches(_count_failed, batch_format="pandas").sum("n_failed") or 0
        )
        summary = {
            "n_docs": int(agg["n_docs"]),
            "n_failed": int(n_failed),
            "success_rate_pct": round(100.0 * (1 - n_failed / max(1, agg["n_docs"])), 2),
            "avg_quality": round(float(agg["avg_quality"]), 2),
            "best_url": top["url"].iloc[0] if len(top) else None,
            "worst_url": None,
        }
        worst = ds.sort(["quality_score", "url"]).limit(1).take_all()
        if worst:
            summary["worst_url"] = worst[0]["url"]
        wrote = {}
        if args.format in ("csv", "both"):
            p = args.output + ".csv"
            top.to_csv(p, index=False)
            wrote["csv"] = p
        if args.format in ("html", "both"):
            import html as _html

            # urls / error strings come from crawled input: escape every
            # interpolated value so a hostile url can't inject script
            p = args.output + ".html"
            rows = "\n".join(
                "<tr>" + "".join(f"<td>{_html.escape(str(r[c]))}</td>" for c in cols) + "</tr>"
                for r in top.to_dict("records")
            )
            head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
            with open(p, "w", encoding="utf-8") as f:
                f.write(
                    "<!doctype html><meta charset='utf-8'><title>extraction report</title>"
                    f"<h1>Extraction quality report</h1><p>{_html.escape(json.dumps(summary))}</p>"
                    f"<table border='1'><tr>{head}</tr>\n{rows}\n</table>"
                )
            wrote["html"] = p
        print(json.dumps({"summary": summary, "top_rows": len(top), **wrote}))
        return 0
    finally:
        if owned:
            ray.shutdown()


def cmd_gen(args: argparse.Namespace) -> int:
    from pdf_extractor_ray.fixtures.generator import write_corpus

    p, g = write_corpus(args.output, args.n_rows, seed=args.seed, fat=args.fat)
    print(json.dumps({"pages": p, "golden": g}))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Export an extracted corpus as deterministic, resumable training
    shards (pipelines/export): md5(id)-bucketed directories with
    _SUCCESS markers; prints the per-shard manifest as JSON lines.
    --format wet instead writes Common-Crawl WET-style WARC shards of
    the extracted text through the distributed datasink."""
    ray, owned = _ray_session(args.num_cpus)
    try:
        import ray.data

        from pdf_extractor_ray.pipelines.export import export_training_shards

        ds = ray.data.read_parquet(args.input, file_extensions=["parquet"])
        if getattr(args, "format", "shards") == "wet":
            from pdf_extractor_ray.sources.warc import write_warc_dataset

            write_warc_dataset(
                ds.select_columns(["url", "warc_ts", "extracted_text"]),
                args.output,
                payload_col="extracted_text",
                warc_type="conversion",
            )
            manifest = json.load(open(os.path.join(args.output, "_SUCCESS")))
            print(json.dumps(manifest))
            return 0
        m = export_training_shards(
            ds, args.output, n_shards=args.shards, id_col=args.id_col
        )
        for _, row in m.iterrows():
            print(json.dumps({k: (int(v) if k in ("shard", "n_rows") else v)
                              for k, v in row.items()}))
        print(json.dumps({"shards_written": len(m), "rows": int(m["n_rows"].sum()) if len(m) else 0}))
        return 0
    finally:
        if owned:
            ray.shutdown()


def cmd_verify(args: argparse.Namespace) -> int:
    """Verification pass over an extracted corpus (reference ST3
    surface): actor pool with the chosen backend, issue rollup by
    type to stdout, optional per-url parquet sink."""
    ray, owned = _ray_session(args.num_cpus)
    try:
        import ray.data

        from pdf_extractor_ray.ops.verifier import verify_extractions

        import pandas as pd

        from pdf_extractor_ray.ops.relational import grouped_sum

        ds = ray.data.read_parquet(args.input, file_extensions=["parquet"])
        verified = verify_extractions(ds, backend=args.backend)
        if args.output:
            verified.write_parquet(args.output)
            # re-read the sink for the rollup so verification runs once
            verified = ray.data.read_parquet(args.output)

        def explode_types(b: pd.DataFrame) -> pd.DataFrame:
            # one row per issue occurrence plus one per doc: the rollup
            # is a distributed grouped count, never a driver loop
            docs = pd.DataFrame({"key": ["__docs__"] * len(b)})
            flagged = pd.DataFrame({"key": ["__flagged__"] * int((b["n_issues"] > 0).sum())})
            items = b["issues"].str.split(",").explode()
            items = items[items != ""]
            types = pd.DataFrame({"key": items.str.split("@").str[0]})
            return pd.concat([docs, flagged, types], ignore_index=True)

        counts = (
            grouped_sum(verified.map_batches(explode_types, batch_format="pandas"), ["key"], [])
            .to_pandas()
            .set_index("key")["n"]
        )
        by_type = {k: int(v) for k, v in counts.items() if not k.startswith("__")}
        print(
            json.dumps(
                {
                    "backend": args.backend,
                    "n_docs": int(counts.get("__docs__", 0)),
                    "n_flagged": int(counts.get("__flagged__", 0)),
                    "issues_by_type": dict(sorted(by_type.items())),
                    "out": args.output or None,
                }
            )
        )
        return 0
    finally:
        if owned:
            ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf_extractor_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run the extraction pipeline")
    ex.add_argument("-i", "--input", required=True, help="pages parquet path/dir")
    ex.add_argument("-o", "--output", required=True, help="output corpus dir")
    ex.add_argument("--no-resume", action="store_true", help="ignore existing manifest (reference --no-skip)")
    ex.add_argument("--sharded", action="store_true", help="shard-granular resumable output (one dir + _SUCCESS per input file group; the corpus-scale resume path)")
    ex.add_argument("--files-per-shard", type=int, default=16)
    ex.add_argument("--concurrency", type=int, default=0)
    ex.add_argument("--num-cpus", type=int, default=0)
    ex.set_defaults(fn=cmd_extract)

    st = sub.add_parser("stats", help="corpus rollup over an output dir")
    st.add_argument("-i", "--input", required=True)
    st.add_argument("--num-cpus", type=int, default=0)
    st.set_defaults(fn=cmd_stats)

    rp = sub.add_parser("report", help="quality-ranking CSV/HTML report over an output dir")
    rp.add_argument("-i", "--input", required=True, help="extracted corpus dir")
    rp.add_argument("-o", "--output", required=True, help="output path base (suffix added)")
    rp.add_argument("--format", choices=["csv", "html", "both"], default="both")
    rp.add_argument("--limit", type=int, default=100, help="ranking rows in the report")
    rp.add_argument("--num-cpus", type=int, default=0)
    rp.set_defaults(fn=cmd_report)

    gn = sub.add_parser("gen", help="generate a deterministic fixture corpus")
    gn.add_argument("-o", "--output", required=True)
    gn.add_argument("-n", "--n-rows", type=int, default=500)
    gn.add_argument("--seed", type=int, default=42)
    gn.add_argument("--fat", type=int, default=1)
    gn.set_defaults(fn=cmd_gen)

    vf = sub.add_parser("verify", help="verification pass over an extracted corpus (ST3)")
    vf.add_argument("-i", "--input", required=True, help="extracted corpus dir")
    vf.add_argument("-o", "--output", default="", help="optional per-url parquet sink dir")
    vf.add_argument("--backend", choices=["heuristic", "ngram", "mock"], default="heuristic")
    vf.add_argument("--num-cpus", type=int, default=0)
    vf.set_defaults(fn=cmd_verify)

    xp = sub.add_parser(
        "export",
        help="export an extracted corpus as deterministic training shards",
    )
    xp.add_argument("-i", "--input", required=True, help="extracted corpus dir")
    xp.add_argument("-o", "--output", required=True, help="shard output dir")
    xp.add_argument("--shards", type=int, default=64)
    xp.add_argument("--format", choices=["shards", "wet"], default="shards")
    xp.add_argument("--id-col", default="url")
    xp.add_argument("--num-cpus", type=int, default=0)
    xp.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
