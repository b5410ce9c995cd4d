"""Multi-engine consensus extraction (reference A9,
multi_engine_extractor.py:75-250: run several engines per document,
score agreement as mean pairwise SequenceMatcher ratio, pick the
primary unless agreement is low).

Engines come from the duck-typed plugin registry
(stages/engines.py, the reference's engine-plugin point SURVEY.md
§2.10): by default the geometry engine plus the reference's
remediation variants (master_extractor.py:617-684), with a
structure-free raw-text engine also registered; real alternative
parsers (pdfminer/pymupdf) plug in via `register_engine` when
available.

Ray shape: one actor-pool map_batches; all variants run per document
inside the UDF (one payload decode, V extraction passes), so no
shuffle and no duplicate payload movement.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pyarrow as pa
import ray.data

from pdf_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig
from pdf_extractor_ray.stages.pools import clamp_pool

CONSENSUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("payload_kind", pa.string()),
        ("consensus", pa.float64()),   # mean pairwise similarity in [0,1]
        ("n_variants", pa.int32()),
        ("len_primary", pa.int64()),
        ("len_spread", pa.int64()),    # max-min extracted length across variants
        ("error", pa.string()),
    ]
)


class ConsensusExtractor:
    """Actor-pool stage: the named engines are built once per actor
    from the plugin registry (stages/engines.py)."""

    def __init__(
        self,
        cfg: PipelineConfig = DEFAULT_CONFIG,
        engine_names: tuple[str, ...] | None = None,
    ) -> None:
        from pdf_extractor_ray.stages.engines import DEFAULT_ENGINE_NAMES, build_engines

        self.engines = build_engines(engine_names or DEFAULT_ENGINE_NAMES, cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        out = {k: [] for k in ("kind", "consensus", "n_variants", "len_primary", "len_spread", "error")}
        for p in payloads:
            p = p or b""
            try:
                results = [e.extract_one(p) for e in self.engines]
                texts = [r["text"] for r in results]
                sims = [
                    SequenceMatcher(None, texts[i], texts[j]).ratio()
                    for i in range(len(texts))
                    for j in range(i + 1, len(texts))
                ]
                lens = [len(t) for t in texts]
                out["kind"].append(results[0]["kind"])
                out["consensus"].append(sum(sims) / len(sims) if sims else 1.0)
                out["n_variants"].append(len(texts))
                out["len_primary"].append(lens[0])
                out["len_spread"].append(max(lens) - min(lens))
                out["error"].append(None)
            except Exception as exc:
                out["kind"].append("error")
                out["consensus"].append(0.0)
                out["n_variants"].append(len(self.engines))
                out["len_primary"].append(0)
                out["len_spread"].append(0)
                out["error"].append(f"{type(exc).__name__}: {exc}"[:200])
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(out["kind"], pa.string()),
                pa.array(out["consensus"], pa.float64()),
                pa.array(out["n_variants"], pa.int32()),
                pa.array(out["len_primary"], pa.int64()),
                pa.array(out["len_spread"], pa.int64()),
                pa.array(out["error"], pa.string()),
            ],
            schema=CONSENSUS_SCHEMA,
        )


def consensus_extract(
    ds: ray.data.Dataset,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    concurrency: int = 4,
    batch_size: int = 16,
    engine_names: tuple[str, ...] | None = None,
) -> ray.data.Dataset:
    return ds.map_batches(
        ConsensusExtractor,
        fn_constructor_args=(cfg, engine_names),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),  # fixed pool, clamped to live CPUs
    )
