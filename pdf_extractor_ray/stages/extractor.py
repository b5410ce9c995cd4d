"""The extraction actor: one map_batches callable class for the whole
per-document chain (HTML boilerplate strip | PDF word-geometry parse).

Mirrors the reference's single shared extractor instance reused across
files (reference processor.py:32) as an actor-pool stage: compiled
pattern tables built ONCE per actor in __init__, per-batch work in
__call__ over zero-copy Arrow record batches. The UDF never raises —
per-row failures become the `error` column (reference's per-file
try/except, processor.py:130-137, and 3-level page recovery ladder,
error_handler.py:437-479, collapse into structured error emission;
SURVEY.md §4.2).
"""

from __future__ import annotations

import json as _json

import pyarrow as pa

from pdf_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig
from pdf_extractor_ray.functions import textstats
from pdf_extractor_ray.functions.html_extract import extract_html, sniff_decode
from pdf_extractor_ray.functions.pdf_words import (
    FIXTURE_MAGIC,
    Patterns,
    extract_pdf_bytes,
)

RESULT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("payload_kind", pa.string()),  # html | pdf | empty
        ("extracted_text", pa.large_string()),
        ("n_blocks", pa.int32()),
        ("n_pages", pa.int32()),
        ("n_words", pa.int64()),
        ("n_footnotes", pa.int32()),
        ("quality_score", pa.float64()),
        ("grade", pa.string()),
        ("coverage_pct", pa.float64()),      # A3: expected-vs-extracted (pdf path; 100 for html)
        ("coverage_status", pa.string()),    # GOOD / WARNING / POOR
        ("n_hallu_flags", pa.int32()),       # anti-hallucination pattern hits
        ("repetition_ratio", pa.float64()),  # D6: distinct 100-char shingle ratio
        ("n_tables_detected", pa.int32()),   # geometry-detected tables (functions/layout.py)
        ("n_rotated_words", pa.int32()),     # M19 rotated-text metric (error_handler.py:488-507)
        ("n_overlapping_words", pa.int32()), # J4 Z-order overlap pairs (error_handler.py:277-312)
        ("n_pages_recovered", pa.int32()),   # recovery-ladder hits (error_handler.py:437-479)
        ("footnote_match_rate", pa.float64()),  # A6 completeness (footnote_extractor.py:403-442)
        ("footnote_status", pa.string()),    # COMPLETE / PARTIAL / POOR
        ("quality_confidence", pa.float64()),  # A10 dimension-variance confidence (quality_scorer.py:366-379)
        ("element_inventory", pa.string()),  # A2 region x size-class counts, JSON (element_inventory.py:85-202)
        ("error", pa.string()),
    ]
)


class Extractor:
    """map_batches(Extractor, batch_format="pyarrow", concurrency=N).

    __init__ runs once per actor (compile regexes, freeze config);
    __call__ once per Arrow batch. Output schema is RESULT_SCHEMA.
    """

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG, ckpt_dir: str | None = None) -> None:
        self.cfg = cfg
        self.pats = Patterns()
        # intra-doc page-checkpoint sidecar dir (cfg.page_ckpt_bytes
        # gates it per payload; wired by ExtractWriter from out_dir)
        self.ckpt_dir = ckpt_dir if cfg.page_ckpt_bytes else None
        # remediation variants (reference master_extractor.py:617-684):
        # attempt 1 disables header/footer removal, attempt 2 widens
        # the column gap / relaxes the HTML block filter
        self.remediation_cfgs = (
            [
                cfg.with_overrides(repeat_min_frac=1.01, max_link_density=0.6),
                cfg.with_overrides(
                    column_gap_threshold=cfg.column_gap_threshold * 1.5,
                    min_paragraph_chars=10,
                ),
            ]
            if cfg.enable_remediation
            else []
        )

    def extract_one(self, payload: bytes, cfg: PipelineConfig | None = None, url: str = "") -> dict:
        """Route one payload and extract. Pure (except the opt-in page
        checkpoint sidecar); may raise."""
        cfg = cfg or self.cfg
        if not payload:
            return {"kind": "empty", "text": "", "n_blocks": 0, "n_pages": 0, "footnotes": []}
        if payload.startswith(b"%PDF"):
            res = None
            if self.ckpt_dir and cfg.page_ckpt_bytes and len(payload) >= cfg.page_ckpt_bytes:
                from pdf_extractor_ray.functions.pdf_words import (
                    extract_pdf_pages_checkpointed,
                    pdf_payload_to_pages,
                )

                pages = pdf_payload_to_pages(payload)
                if pages is not None:
                    import hashlib as _hashlib
                    import os as _os

                    # key includes the config (remediation re-extracts
                    # with altered thresholds and must not reuse pages
                    # journaled under the default ladder) AND a payload
                    # digest: two rows with the same url but different
                    # content (a recrawl at another warc_ts) must not
                    # share a sidecar, or a retry could resume from the
                    # other payload's journaled pages
                    body = _hashlib.sha1(payload).hexdigest()
                    tag = _hashlib.sha1(
                        f"{url}\x1f{body}\x1f{cfg!r}".encode("utf-8")
                    ).hexdigest()[:16]
                    res = extract_pdf_pages_checkpointed(
                        pages, _os.path.join(self.ckpt_dir, f"{tag}.pages.jsonl"), self.pats, cfg
                    )
            if res is None:
                res = extract_pdf_bytes(payload, self.pats, cfg)
            return {
                "kind": "pdf",
                "text": res["text"],
                "n_blocks": res["n_pages"],
                "n_pages": res["n_pages"],
                "footnotes": res["footnotes"],
                "coverage_pct": res.get("coverage_pct", 100.0),
                "coverage_status": res.get("coverage_status", "GOOD"),
                "n_tables_detected": res.get("n_tables_detected", 0),
                "n_rotated_words": res.get("n_rotated_words", 0),
                "n_overlapping_words": res.get("n_overlapping_words", 0),
                "n_pages_recovered": res.get("n_pages_recovered", 0),
                "fn_report": res.get("fn_report", {}),
                "inventory": res.get("inventory", {}),
            }
        if cfg.charset_sniff:
            html, _enc = sniff_decode(payload)
        else:
            html = payload.decode("utf-8", errors="replace")
        text, n_blocks = extract_html(html, cfg)
        return {
            "kind": "html",
            "text": text,
            "n_blocks": n_blocks,
            "n_pages": 0,
            "footnotes": [],
            "coverage_pct": 100.0,
            "coverage_status": "GOOD",
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        tss = batch.column("warc_ts").to_pylist() if "warc_ts" in batch.column_names else [None] * len(urls)

        kinds, texts, n_blocks, n_pages, n_words, n_fns, scores, grades, errors = (
            [], [], [], [], [], [], [], [], [],
        )
        cov_pcts, cov_stats, hallu_ns, rep_ratios = [], [], [], []
        tbl_ns, rot_ns, ovl_ns, rec_ns, fn_rates, fn_stats, q_confs = [], [], [], [], [], [], []
        inventories = []

        def _dims_nw(r: dict) -> tuple[dict, int]:
            rep = r.get("fn_report", {})
            return textstats.quality_dimensions_nw(
                r["text"], rep.get("n_matches", len(r["footnotes"])), rep.get("n_markers", len(r["footnotes"]))
            )

        def _score(r: dict) -> float:
            return textstats.quality_score_from_dims(_dims_nw(r)[0])

        for url, payload in zip(urls, payloads):
            try:
                r = self.extract_one(payload or b"", url=url)
                dims, nw = _dims_nw(r)
                score = textstats.quality_score_from_dims(dims)
                if self.remediation_cfgs and score < self.cfg.remediation_threshold and r["kind"] != "empty":
                    # in-UDF remediation loop (cheap, local — never a
                    # dataset-level control flow, SURVEY §7.4 #7)
                    best_s, best_r = score, r
                    for vc in self.remediation_cfgs:
                        r2 = self.extract_one(payload or b"", vc, url=url)
                        s2 = _score(r2)
                        if s2 > best_s:
                            best_s, best_r = s2, r2
                    score, r = best_s, best_r
                    dims, nw = _dims_nw(r)
                text = r["text"]
                if self.cfg.strip_hallucinations:  # opt-in transform (default off)
                    text, _ = textstats.strip_hallucinations(text)
                    nw = len(text.split())  # transformed text: recount
                fns = r["footnotes"]
                kinds.append(r["kind"])
                texts.append(text)
                n_blocks.append(r["n_blocks"])
                n_pages.append(r["n_pages"])
                n_words.append(nw)
                n_fns.append(len(fns))
                scores.append(score)
                grades.append(textstats.grade(score))
                cov_pcts.append(r.get("coverage_pct", 100.0))
                cov_stats.append(r.get("coverage_status", "GOOD"))
                hallu_ns.append(len(textstats.hallucination_flags(text)))
                rep_ratios.append(textstats.repetition_ratio(text))
                tbl_ns.append(r.get("n_tables_detected", 0))
                rot_ns.append(r.get("n_rotated_words", 0))
                ovl_ns.append(r.get("n_overlapping_words", 0))
                rec_ns.append(r.get("n_pages_recovered", 0))
                rep = r.get("fn_report", {})
                fn_rates.append(rep.get("match_rate", 100.0))
                fn_stats.append(rep.get("status", "COMPLETE"))
                q_confs.append(textstats.quality_confidence(dims))
                inventories.append(_json.dumps(r.get("inventory", {}), sort_keys=True))
                errors.append(None)
            except Exception as exc:  # never raise: poison-blob guard
                kinds.append("error")
                texts.append("")
                n_blocks.append(0)
                n_pages.append(0)
                n_words.append(0)
                n_fns.append(0)
                scores.append(0.0)
                grades.append("F")
                cov_pcts.append(0.0)
                cov_stats.append("POOR")
                hallu_ns.append(0)
                rep_ratios.append(1.0)
                tbl_ns.append(0)
                rot_ns.append(0)
                ovl_ns.append(0)
                rec_ns.append(0)
                fn_rates.append(100.0)
                fn_stats.append("COMPLETE")
                q_confs.append(0.3)
                inventories.append("{}")
                errors.append(f"{type(exc).__name__}: {exc}"[:500])

        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(tss, pa.timestamp("us")),
                pa.array(langs, pa.string()),
                pa.array(kinds, pa.string()),
                pa.array(texts, pa.large_string()),
                pa.array(n_blocks, pa.int32()),
                pa.array(n_pages, pa.int32()),
                pa.array(n_words, pa.int64()),
                pa.array(n_fns, pa.int32()),
                pa.array(scores, pa.float64()),
                pa.array(grades, pa.string()),
                pa.array(cov_pcts, pa.float64()),
                pa.array(cov_stats, pa.string()),
                pa.array(hallu_ns, pa.int32()),
                pa.array(rep_ratios, pa.float64()),
                pa.array(tbl_ns, pa.int32()),
                pa.array(rot_ns, pa.int32()),
                pa.array(ovl_ns, pa.int32()),
                pa.array(rec_ns, pa.int32()),
                pa.array(fn_rates, pa.float64()),
                pa.array(fn_stats, pa.string()),
                pa.array(q_confs, pa.float64()),
                pa.array(inventories, pa.string()),
                pa.array(errors, pa.string()),
            ],
            schema=RESULT_SCHEMA,
        )


__all__ = ["Extractor", "RESULT_SCHEMA", "FIXTURE_MAGIC"]
