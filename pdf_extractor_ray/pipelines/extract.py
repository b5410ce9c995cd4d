"""End-to-end extraction pipeline (the flagship; SURVEY.md §7.0).

    read_parquet(pages)                # prune to url,warc_ts,html,lang
      [resume filter: anti-join completed urls from the manifest]
      .map_batches(Extractor, pyarrow, actor pool)
      .map_batches(PartitionWriter)    # corpus -> partitioned parquet + lineage
    corpus checks: groupby(lang) aggregates / sort(url) / dedup(url)

Scale notes (designed for ~100 TB / 10^12 rows, tested single-node):
- the read prunes columns; `override_num_blocks` keeps input blocks
  small so one fat row-group can't serialize a stage;
- the extraction stage is an actor pool (compiled patterns amortized);
  batch_size is small because rows carry multi-KB..MB blobs;
- the writer emits only tiny manifest rows downstream, so consuming
  the pipeline materializes ~1 row per partition, never the corpus;
- nothing here calls ray.init(); callers own the session.
"""

from __future__ import annotations

import ray.data

from pdf_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig
from pdf_extractor_ray.stages.extractor import Extractor
from pdf_extractor_ray.state.manifest import PartitionWriter, completed_urls

INPUT_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_pages(path: str | list[str], num_blocks: int | None = None) -> ray.data.Dataset:
    kw = {"columns": INPUT_COLUMNS}
    if num_blocks:
        kw["override_num_blocks"] = num_blocks
    return ray.data.read_parquet(path, **kw)


from pdf_extractor_ray.stages.pools import clamp_pool  # noqa: F401  (public re-export)


# per-worker-process caches: one Extractor / writer pair per (config,
# out_dir), built on a worker's first batch and reused for every later
# task that lands on that worker (workers are prestarted at ray.init
# and live for the session)
_TASK_CACHE: dict = {}


def _extract_task(batch, cfg: PipelineConfig):
    e = _TASK_CACHE.get(cfg)
    if e is None:
        e = _TASK_CACHE[cfg] = Extractor(cfg)
    return e(batch)


def _extract_write_task(batch, cfg: PipelineConfig, out_dir: str):
    key = (cfg, out_dir)
    ew = _TASK_CACHE.get(key)
    if ew is None:
        ew = _TASK_CACHE[key] = ExtractWriter(cfg, out_dir)
    return ew(batch)


def split_by_blob_size(
    ds: ray.data.Dataset, threshold_bytes: int, blob_col: str = "html"
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Two-tier routing: (small, big) branches split on payload size.
    Multi-MB blobs go to the big branch where a TINY batch size keeps
    one huge document from holding hundreds of siblings hostage in its
    batch (and keeps batch x concurrency within the worker heap).

    Each branch re-scans the pruned input and filters — two passes
    over the read, which is the documented cost of branch-level batch
    sizing in a streaming Dataset; extraction dominates the read by
    >10x, and at warehouse scale the blob-size split would move into
    the writer so branches read disjoint files."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def small(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(pc.binary_length(t[blob_col]), threshold_bytes))

    def big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(pc.binary_length(t[blob_col]), threshold_bytes))

    return (
        ds.map_batches(small, batch_format="pyarrow"),
        ds.map_batches(big, batch_format="pyarrow"),
    )


def extraction_dataset(
    source: str | ray.data.Dataset,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Lazy Dataset of extraction results (RESULT_SCHEMA rows). Rows
    with blobs >= cfg.big_blob_bytes run in a separate branch with
    batch_size = cfg.big_blob_batch_size (see split_by_blob_size);
    set big_blob_bytes=0 to disable the split."""
    ds = read_pages(source, num_blocks) if isinstance(source, (str, list)) else source
    kw = dict(fn_kwargs={"cfg": cfg}, batch_format="pyarrow", num_cpus=cfg.num_cpus_per_actor)
    if cfg.big_blob_bytes:
        small_ds, big_ds = split_by_blob_size(ds, cfg.big_blob_bytes)
        return small_ds.map_batches(_extract_task, batch_size=cfg.batch_size, **kw).union(
            big_ds.map_batches(_extract_task, batch_size=cfg.big_blob_batch_size, **kw)
        )
    return ds.map_batches(_extract_task, batch_size=cfg.batch_size, **kw)


class ExtractWriter:
    """Fused extract+sink stage: one actor pool extracts a batch and
    immediately writes it as one output partition + manifest sidecar.

    Fusing removes the inter-stage hand-off entirely — measured 1.6x
    end-to-end over a separate writer pool at 8 CPUs (no backpressure
    stalls, no CPU-budget split, write cost naturally interleaved per
    batch). The partition granularity IS the batch size
    (cfg.rows_per_output_file rows per output file)."""

    def __init__(self, cfg: PipelineConfig, out_dir: str) -> None:
        import os as _os

        # page-checkpoint sidecars live next to the output partitions
        # so the retrying worker finds them regardless of which node it
        # lands on (shared filesystem / object store path in prod)
        ckpt_dir = _os.path.join(out_dir, "_pageckpt") if cfg.page_ckpt_bytes else None
        self.extract = Extractor(cfg, ckpt_dir=ckpt_dir)
        self.write = PartitionWriter(out_dir)

    def __call__(self, batch):
        return self.write(self.extract(batch))


def _run_log(out_dir: str, event: str, **fields) -> None:
    """S8 log sink (reference writes a per-run logfile via the stdlib
    logging handler, processor.py; here: one JSON line per driver-side
    event appended to <out_dir>/_run.log). Per-task logs stay in Ray's
    worker logs — a 100-TB run must not funnel per-row events through
    one file."""
    import datetime
    import json as _json
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    rec = {"ts": datetime.datetime.now(datetime.timezone.utc).isoformat(), "event": event}
    rec.update(fields)
    with open(_os.path.join(out_dir, "_run.log"), "a", encoding="utf-8") as f:
        f.write(_json.dumps(rec, ensure_ascii=False) + "\n")


def run_extraction(
    input_path: str | list[str] | ray.data.Dataset,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    num_blocks: int | None = None,
) -> dict:
    """Run the flagship pipeline to a partitioned parquet corpus with a
    checkpoint manifest; returns run stats. Re-running after a crash
    skips every url already recorded in the manifest (idempotent).
    `input_path` may be parquet path(s) or any Dataset with the page
    schema — e.g. `sources.warc.read_warc_pages(shards)` for
    WARC-native ingest with the same checkpoint/resume semantics."""
    if isinstance(input_path, ray.data.Dataset):
        ds = input_path
        _run_log(out_dir, "run_start", input="<dataset>", resume=resume)
    else:
        _run_log(out_dir, "run_start", input=str(input_path), resume=resume)
        ds = read_pages(input_path, num_blocks)
    n_skipped = 0
    if resume:
        done = completed_urls(out_dir)
        if done:
            import ray as _ray

            done_ref = _ray.put(sorted(done))  # broadcast once, read per task

            def _skip_done(batch):
                import pyarrow as pa
                import pyarrow.compute as pc

                key = ("done_arr", done_ref.hex())
                arr = _TASK_CACHE.get(key)
                if arr is None:  # build the Arrow value set once per worker
                    arr = _TASK_CACHE[key] = pa.array(_ray.get(done_ref), pa.string())
                mask = pc.invert(pc.is_in(batch.column("url"), value_set=arr))
                return batch.filter(mask)

            n_skipped = len(done)
            ds = ds.map_batches(_skip_done, batch_format="pyarrow")
    kw = dict(
        fn_kwargs={"cfg": cfg, "out_dir": out_dir},
        batch_format="pyarrow",
        num_cpus=cfg.num_cpus_per_actor,
    )
    if cfg.big_blob_bytes:
        # two-tier sink: big blobs write in tiny partitions of their
        # own (partition names are url-set hashes — no collisions)
        small_ds, big_ds = split_by_blob_size(ds, cfg.big_blob_bytes)
        manifest = small_ds.map_batches(
            _extract_write_task, batch_size=cfg.rows_per_output_file, **kw
        ).union(big_ds.map_batches(_extract_write_task, batch_size=cfg.big_blob_batch_size, **kw))
    else:
        manifest = ds.map_batches(_extract_write_task, batch_size=cfg.rows_per_output_file, **kw)
    rows = manifest.take_all()  # tiny: one row per output partition
    import os as _os

    stats = {
        "partitions_written": len(rows),
        "rows_written": int(sum(r["n_rows"] for r in rows)),
        "urls_skipped_resume": n_skipped,
        "out_dir": out_dir,
        # opt-in: Ray Data per-stage timing breakdown for perf triage
        "dataset_stats": manifest.stats() if _os.environ.get("BENCH_PRINT_STATS") == "1" else None,
    }
    _run_log(
        out_dir,
        "run_complete",
        partitions_written=stats["partitions_written"],
        rows_written=stats["rows_written"],
        urls_skipped_resume=n_skipped,
    )
    return stats


def run_extraction_sharded(
    input_path: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    files_per_shard: int = 16,
    num_blocks: int | None = None,
) -> dict:
    """Shard-granular resumable extraction — the 100-TB resume path.

    The driver-set url resume in run_extraction is exact but O(urls)
    on the driver, which caps it at test scale (VERDICT r1). This
    wrapper bounds that cost structurally: the input file list is
    split into shard groups, each group writes its OWN output
    directory with a `_SUCCESS` marker written only after the group's
    pipeline completes. On re-run:

      - a shard dir with `_SUCCESS` is skipped with ZERO reads (no
        manifest parse, no url set, no input scan);
      - only the (single) interrupted shard falls back to url-level
        manifest resume, so the broadcast url set is bounded by
        files_per_shard x rows-per-file regardless of corpus size.

    Driver memory is O(number of input files), never O(rows). The
    corpus stays one logical dataset: read_parquet(out_dir/*/...) or
    corpus_files(out_dir). Mirrors the reference's skip-if-output-
    exists resume (processor.py:113-116) at file granularity."""
    import glob as _glob
    import json as _json
    import os as _os

    if _os.path.isdir(input_path):
        files = sorted(_glob.glob(_os.path.join(input_path, "*.parquet")))
    else:
        files = [input_path]
    if not files:
        raise ValueError(f"no parquet inputs under {input_path}")
    groups = [files[i : i + files_per_shard] for i in range(0, len(files), files_per_shard)]
    totals = {"partitions_written": 0, "rows_written": 0, "urls_skipped_resume": 0}
    shards_skipped = 0
    for gi, group in enumerate(groups):
        shard_dir = _os.path.join(out_dir, f"shard-{gi:05d}")
        marker = _os.path.join(shard_dir, "_SUCCESS")
        if _os.path.exists(marker):
            shards_skipped += 1
            _run_log(out_dir, "shard_skipped", shard=gi)
            continue
        stats = run_extraction(group, shard_dir, cfg, resume=True, num_blocks=num_blocks)
        _run_log(out_dir, "shard_complete", shard=gi, rows_written=stats["rows_written"])
        with open(marker + ".tmp", "w", encoding="utf-8") as f:
            _json.dump(
                {"n_files": len(group), "rows_written": stats["rows_written"]}, f
            )
        _os.replace(marker + ".tmp", marker)  # atomic publish
        for k in totals:
            totals[k] += stats[k]
    totals.update({"out_dir": out_dir, "n_shards": len(groups), "shards_skipped": shards_skipped})
    return totals


def corpus_files(out_dir: str) -> list[str]:
    """All corpus partition files under a (possibly sharded) out_dir,
    excluding manifest sidecars — feed to ray.data.read_parquet."""
    import glob as _glob
    import os as _os

    flat = _glob.glob(_os.path.join(out_dir, "part-*.parquet"))
    sharded = _glob.glob(_os.path.join(out_dir, "shard-*", "part-*.parquet"))
    return sorted(flat + sharded)


def corpus_stats_by_lang(results: ray.data.Dataset) -> ray.data.Dataset:
    """groupby-lang corpus aggregate (north rule; reference batch stats
    processor.py:139-171 as a distributed groupby)."""
    from ray.data.aggregate import Count, Mean, Sum

    return results.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_words", alias_name="total_words"),
        Mean("quality_score", alias_name="avg_quality"),
    )


def dedup_by_url(results: ray.data.Dataset, num_partitions: int = 32) -> ray.data.Dataset:
    """Exact corpus dedup on url: earliest warc_ts wins (reference
    skip-existing D4 generalized; SURVEY.md §2.7 D-global).

    Shuffles on hash(url) mod num_partitions — NOT one Ray group per
    url (10^9 urls would mean 10^9 Python calls) — then one vectorized
    pandas pass per partition; a per-batch local pre-dedup keeps the
    shuffle payload at one row per url per batch."""
    import numpy as np
    import pandas as pd

    def local_first(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["url", "warc_ts"], kind="stable").drop_duplicates("url", keep="first")
        b = b.copy()
        h = pd.util.hash_array(b["url"].to_numpy())
        b["_part"] = (h % num_partitions).astype(np.int64)
        return b

    def part_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "warc_ts"], kind="stable").drop_duplicates("url", keep="first")
        return g.drop(columns=["_part"])

    return (
        results.map_batches(local_first, batch_format="pandas")
        .groupby("_part")
        .map_groups(part_first, batch_format="pandas")
    )
