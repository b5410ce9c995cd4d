"""pdf_extractor_ray — a Ray-Data-native main-content extraction engine.

Brand-new implementation (NOT a port) with the per-document semantics of
the reference `praveenkumar-droid/pdf-extractor` (read-only at
/root/reference/pdf_extractor_new/):

- PDF/layout path: word-geometry parsing — reading-order sort, column
  detection, smart metadata filtering, script integration, table
  exclusion/insertion, footnote matching (reference semantics at
  extractor.py:91-994, footnote_extractor.py, layout_analyzer.py).
- HTML path: DOM-tree boilerplate stripping (tag-density +
  text-to-link-ratio block scoring, trafilatura/jusText-style) —
  designed from public literature; the reference has no HTML path.

Determinism contract (reference extractor.py:3-9, config.py:26-35):
EXTRACT ONLY, NEVER TRANSFORM — same input bytes => byte-identical
extracted text. No wall-clock, no randomness, no locale dependence.

Execution model: ray.data.Dataset -> map_batches over zero-copy Arrow
batches; stateful parser instances live in actor pools; corpus-level
ops (groupby-lang aggregates, sort-by-url, dedup) are native Ray Data
shuffles. Nothing here calls ray.init()/ray.shutdown().
"""

from pdf_extractor_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
