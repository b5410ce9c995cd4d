"""Review-flag generation over extraction results (reference ST6,
flagging_system.py:64-160: FlaggingSystem accumulates Flag records
with severities and a review report).

Distributed redesign: the reference's mutable in-process accumulator
with a monotonic `FLAG-{counter:04d}` id cannot exist on a cluster
(a global counter is a serialization point), so flag ids here are
DETERMINISTIC per document — `FLAG-{sha1(url + warc_ts)[:16]}-{seq:02d}`
— stable across runs/retries without coordination. Ids are unique per
distinct (url, warc_ts) row (a pre-dedup corpus re-crawling one url at
the same timestamp repeats its ids — by design, the rows are the same
document); 16 hex chars = 64 bits keeps birthday collisions negligible
past 10^9 distinct documents.
Flags are derived per batch from the extraction result columns (no
extra pass over payloads); the summary rollup is a grouped count.

Flag rules mirror the reference's helpers:
- low quality confidence  -> LOW_CONFIDENCE, severity by threshold
  (<0.5 high, <0.7 medium, else low — flagging_system.py:84-89)
- footnote_status != COMPLETE -> FOOTNOTE_MISMATCH (:95-98)
- coverage POOR           -> MISSING_CONTENT
- hallucination patterns  -> OCR_ERROR-class review flag
- overlapping words       -> LAYOUT_ISSUE
- extraction error        -> MANUAL_REVIEW, critical
"""

from __future__ import annotations

import hashlib

import pandas as pd
import ray.data

FLAG_COLUMNS = ["flag_id", "url", "flag_type", "severity", "message"]


def _doc_flags(row: dict) -> list[tuple[str, str, str]]:
    """(flag_type, severity, message) tuples for one result row."""
    out: list[tuple[str, str, str]] = []
    if row.get("error"):
        out.append(("manual_review", "critical", f"extraction error: {row['error'][:80]}"))
        return out
    conf = row.get("quality_confidence", 1.0)
    if conf < 0.7:
        sev = "high" if conf < 0.5 else "medium"
        out.append(("low_confidence", sev, f"quality confidence {conf:.2f}"))
    elif conf < 0.9:
        out.append(("low_confidence", "low", f"quality confidence {conf:.2f}"))
    if row.get("footnote_status", "COMPLETE") != "COMPLETE":
        out.append(
            (
                "footnote_mismatch",
                "medium",
                f"footnote match rate {row.get('footnote_match_rate', 0.0):.0f}%",
            )
        )
    if row.get("coverage_status") == "POOR":
        out.append(("missing_content", "high", f"coverage {row.get('coverage_pct', 0.0):.0f}%"))
    if row.get("n_hallu_flags", 0) > 0:
        out.append(("ocr_error", "medium", f"{row['n_hallu_flags']} generated-markup patterns"))
    if row.get("n_overlapping_words", 0) > 0:
        out.append(("layout_issue", "medium", f"{row['n_overlapping_words']} overlapping word pairs"))
    return out


def flags_from_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch flag derivation (vector columns in, one row per flag
    out). Deterministic ids: FLAG-{sha1(url + warc_ts)[:16]}-{seq:02d}
    (see module docstring for the uniqueness contract)."""
    ids, urls, types, sevs, msgs = [], [], [], [], []
    for row in batch.to_dict("records"):
        url = row.get("url", "")
        key = f"{url}\x1f{row.get('warc_ts', '')}"
        doc_tag = hashlib.sha1(key.encode("utf-8")).hexdigest()[:16]
        for seq, (ftype, sev, msg) in enumerate(_doc_flags(row)):
            ids.append(f"FLAG-{doc_tag}-{seq:02d}")
            urls.append(url)
            types.append(ftype)
            sevs.append(sev)
            msgs.append(msg)
    return pd.DataFrame(
        {
            "flag_id": pd.array(ids, dtype="string"),
            "url": pd.array(urls, dtype="string"),
            "flag_type": pd.array(types, dtype="string"),
            "severity": pd.array(sevs, dtype="string"),
            "message": pd.array(msgs, dtype="string"),
        }
    )


def flag_documents(results: ray.data.Dataset) -> ray.data.Dataset:
    """Flag Dataset over extraction results — one row per flag."""
    return results.map_batches(flags_from_batch, batch_format="pandas")


def flag_summary(flags: ray.data.Dataset) -> ray.data.Dataset:
    """Severity x type rollup (the reference's get_summary as a
    distributed grouped count)."""
    from pdf_extractor_ray.ops.relational import grouped_sum

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        return b[["flag_type", "severity"]]

    return grouped_sum(flags.map_batches(proj, batch_format="pandas"), ["flag_type", "severity"], [])
