"""Resume / idempotency: a partially-completed run (simulated by
pre-writing some partitions) restarts without re-extracting completed
urls and converges to the same corpus (FIXTURES.md F5)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_ray.config import DEFAULT_CONFIG
from pdf_extractor_ray.pipelines.extract import run_extraction
from pdf_extractor_ray.state.manifest import completed_urls, load_manifest

CFG = DEFAULT_CONFIG.with_overrides(rows_per_output_file=64, batch_size=16, concurrency=2)


def _corpus_pairs(out_dir):
    tables = [pq.read_table(p) for p in sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))]
    t = pa.concat_tables(tables)
    return set(zip(t["url"].to_pylist(), t["extracted_text"].to_pylist()))


def test_resume_skips_completed_urls(ray_session, pages_path, tmp_path):
    full = str(tmp_path / "full")
    partial = str(tmp_path / "partial")

    run_extraction(pages_path, full, cfg=CFG, resume=False)

    # simulate a killed run: copy HALF the partitions+manifest to `partial`
    os.makedirs(os.path.join(partial, "_manifest"), exist_ok=True)
    parts = sorted(glob.glob(os.path.join(full, "part-*.parquet")))
    assert len(parts) >= 2, "need multiple partitions to simulate a partial run"
    for p in parts[: len(parts) // 2]:
        pid = os.path.basename(p)[len("part-") : -len(".parquet")]
        import shutil

        shutil.copy(p, os.path.join(partial, os.path.basename(p)))
        shutil.copy(
            os.path.join(full, "_manifest", f"{pid}.json"),
            os.path.join(partial, "_manifest", f"{pid}.json"),
        )

    done_before = completed_urls(partial)
    assert done_before

    stats = run_extraction(pages_path, partial, cfg=CFG, resume=True)
    assert stats["urls_skipped_resume"] == len(done_before)

    # resumed corpus must be identical (per distinct url/text pair) to the
    # uninterrupted run; no url extracted twice beyond input duplicates
    assert _corpus_pairs(partial) == _corpus_pairs(full)

    m = load_manifest(partial)
    all_urls = [u for r in m for u in r["urls"]]
    input_urls = pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
    # each INPUT occurrence processed at most once per distinct url
    assert len(all_urls) <= len(input_urls)
    assert set(all_urls) == set(input_urls)


def test_rerun_on_complete_output_is_noop(ray_session, pages_path, tmp_path):
    out = str(tmp_path / "done")
    run_extraction(pages_path, out, cfg=CFG, resume=False)
    before = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    stats = run_extraction(pages_path, out, cfg=CFG, resume=True)
    assert stats["rows_written"] <= 2  # only the duplicate-url re-occurrences at most
    after = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert set(before) <= set(after)
