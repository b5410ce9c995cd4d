"""CLI entry points (the reference's main.py:33-82 /
professional_runner.py:123-165 surface, re-expressed for a Dataset
engine). This module OWNS a Ray session (guarded); library code never
does.

    python -m pdf_extractor_ray.cli extract -i pages.parquet -o /tmp/out
    python -m pdf_extractor_ray.cli stats   -i /tmp/out
    python -m pdf_extractor_ray.cli gen     -o /tmp/corpus -n 5000 [--fat 6]
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    return ray


def cmd_extract(args: argparse.Namespace) -> int:
    ray = _ray_session(args.num_cpus)
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
        ray.shutdown()


def cmd_stats(args: argparse.Namespace) -> int:
    """Corpus rollup over an extracted output dir (groupby-lang +
    grade histogram; reference report S5, processor.py:139-171)."""
    ray = _ray_session(args.num_cpus)
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
        ray.shutdown()


def cmd_gen(args: argparse.Namespace) -> int:
    from pdf_extractor_ray.fixtures.generator import write_corpus

    p, g = write_corpus(args.output, args.n_rows, seed=args.seed, fat=args.fat)
    print(json.dumps({"pages": p, "golden": g}))
    return 0


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

    gn = sub.add_parser("gen", help="generate a deterministic fixture corpus")
    gn.add_argument("-o", "--output", required=True)
    gn.add_argument("-n", "--n-rows", type=int, default=500)
    gn.add_argument("--seed", type=int, default=42)
    gn.add_argument("--fat", type=int, default=1)
    gn.set_defaults(fn=cmd_gen)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
