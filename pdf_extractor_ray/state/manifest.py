"""Checkpoint manifest: per-partition lineage + idempotent resume.

Ray Data has no cross-job resume (SURVEY.md §4.2); this module supplies
it — the Ray analog of the reference's skip-if-output-exists
(processor.py:113-116) and page-checkpoint JSON
(large_doc_extractor.py:279-298), redesigned for a partitioned corpus:

- Each extraction batch is written as ONE parquet partition file whose
  name is a content hash of its url set (idempotent under Ray task
  retries: a retried task rewrites the same bytes to the same name via
  atomic tmp+rename).
- Alongside it, `_manifest/<id>.json` records lineage:
  {partition_id, n_rows, url_min, url_max, stage_checksum (sha256 over
  url+extracted_text pairs), wall_time_s}.
- Resume = load the completed url set from the manifest sidecars and
  anti-join the input (broadcast the set via ray.put at test scale;
  at 10^12-row scale this becomes a hash-partitioned anti-join or a
  Bloom filter per input shard — the manifest already stores
  url_min/url_max ranges so shards fully covered by completed ranges
  can be pruned at the read).

No wall-clock enters the DATA: wall_time_s lives only in the manifest
sidecar, never in output rows, preserving byte-identity of the corpus.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"

_MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("n_rows", pa.int64()),
        ("url_min", pa.string()),
        ("url_max", pa.string()),
        ("stage_checksum", pa.string()),
    ]
)


def _partition_id(urls: list[str]) -> str:
    h = hashlib.sha1()
    for u in sorted(urls):
        h.update(u.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _stage_checksum(batch: pa.Table) -> str:
    h = hashlib.sha256()
    urls = batch.column("url").to_pylist()
    texts = batch.column("extracted_text").to_pylist()
    for u, t in sorted(zip(urls, texts)):
        h.update(u.encode("utf-8"))
        h.update(b"\x00")
        h.update((t or "").encode("utf-8"))
        h.update(b"\x01")
    return h.hexdigest()


class PartitionWriter:
    """map_batches stage that sinks extraction batches to partitioned
    parquet + manifest sidecars and emits one tiny manifest row per
    partition (so the pipeline's consumed output is the manifest, not
    the corpus — the corpus streams straight to disk)."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.mdir = os.path.join(out_dir, MANIFEST_DIR)
        os.makedirs(self.out_dir, exist_ok=True)
        os.makedirs(self.mdir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        # re-ensure dirs on every write: writers are cached per worker
        # process across runs (pipelines/extract._TASK_CACHE), and a
        # later run may start after the previous output dir was removed
        os.makedirs(self.mdir, exist_ok=True)
        urls = batch.column("url").to_pylist()
        if not urls:
            return _MANIFEST_ROW_SCHEMA.empty_table()
        pid = _partition_id(urls)
        path = os.path.join(self.out_dir, f"part-{pid}.parquet")
        tmp = path + ".tmp"
        pq.write_table(batch, tmp)
        os.replace(tmp, path)  # atomic publish
        row = {
            "partition_id": pid,
            "n_rows": len(urls),
            "url_min": min(urls),
            "url_max": max(urls),
            "stage_checksum": _stage_checksum(batch),
            "wall_time_s": round(time.monotonic() - t0, 4),
            "urls": urls,  # test-scale resume; at corpus scale drop this
        }
        mtmp = os.path.join(self.mdir, f"{pid}.json.tmp")
        with open(mtmp, "w", encoding="utf-8") as f:
            json.dump(row, f)
        os.replace(mtmp, os.path.join(self.mdir, f"{pid}.json"))
        return pa.table(
            {
                "partition_id": pa.array([pid], pa.string()),
                "n_rows": pa.array([len(urls)], pa.int64()),
                "url_min": pa.array([row["url_min"]], pa.string()),
                "url_max": pa.array([row["url_max"]], pa.string()),
                "stage_checksum": pa.array([row["stage_checksum"]], pa.string()),
            },
            schema=_MANIFEST_ROW_SCHEMA,
        )


def completed_urls(out_dir: str) -> set[str]:
    """Urls already extracted, from manifest sidecars (resume input)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[str] = set()
    if not os.path.isdir(mdir):
        return done
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name), encoding="utf-8") as f:
                done.update(json.load(f)["urls"])
        except (OSError, ValueError, KeyError):
            continue  # torn sidecar from a killed run: its partition re-runs
    return done


def load_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    rows = []
    if not os.path.isdir(mdir):
        return rows
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name), encoding="utf-8") as f:
                    rows.append(json.load(f))
            except (OSError, ValueError):
                continue
    return rows
