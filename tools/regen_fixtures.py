"""Regenerate the committed golden fixture corpus (tests/fixtures/).

Run ONLY when extraction semantics change deliberately (CLAUDE.md
determinism contract) — review the golden diff before committing:

    python tools/regen_fixtures.py          # writes tests/fixtures/
    git diff --stat tests/fixtures          # then inspect

Prints a summary of which urls' golden_text changed vs the previous
files so the review is concrete.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from pdf_extractor_ray.fixtures.generator import write_corpus

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")
N_ROWS = 500  # committed corpus size (504 rows with skew knobs)


def main() -> None:
    old_golden = {}
    gp = os.path.join(FIXTURE_DIR, "golden.parquet")
    if os.path.exists(gp):
        t = pq.read_table(gp)
        old_golden = dict(zip(t["url"].to_pylist(), t["golden_text"].to_pylist()))

    pages_path, golden_path = write_corpus(FIXTURE_DIR, N_ROWS)
    t = pq.read_table(golden_path)
    new_golden = dict(zip(t["url"].to_pylist(), t["golden_text"].to_pylist()))

    added = sorted(set(new_golden) - set(old_golden))
    removed = sorted(set(old_golden) - set(new_golden))
    changed = sorted(u for u in new_golden if u in old_golden and new_golden[u] != old_golden[u])
    print(f"wrote {pages_path} + {golden_path}")
    print(f"goldens: {len(new_golden)} total, {len(added)} added, {len(removed)} removed, {len(changed)} changed")
    for u in changed[:10]:
        print("  changed:", u)


if __name__ == "__main__":
    main()
