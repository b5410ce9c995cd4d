"""Document chunking for long-context training data (reference
context_windows.py:48-56, 162-213: chunk_by characters/words with a
fixed overlap; the reassembly-side overlap dedup at :407-466 is the
inverse).

Ray shape: a stateless flat-map — each input doc row becomes
`ceil(len/stride)` chunk rows. No shuffle; chunk ids are
deterministic (doc_id, chunk_index) so downstream dedup/resume can
key on them. Overlap text is carried at the FRONT of each chunk after
the first, mirroring the reference's strategy."""

from __future__ import annotations

import pandas as pd
import ray.data


def chunk_text(text: str, max_chars: int, overlap: int) -> list[str]:
    """Split into chunks of at most max_chars, each (after the first)
    starting with the last `overlap` chars of the previous chunk."""
    if max_chars <= overlap:
        raise ValueError("max_chars must exceed overlap")
    if len(text) <= max_chars:
        return [text]
    stride = max_chars - overlap
    return [text[start : start + max_chars] for start in range(0, len(text) - overlap, stride)]


def dechunk_texts(chunks: list[str], overlap: int) -> str:
    """Inverse: strip the leading overlap from every chunk after the
    first (reference context_windows.py:407-466 overlap dedup)."""
    if not chunks:
        return ""
    return chunks[0] + "".join(c[overlap:] for c in chunks[1:])


def chunk_text_by_words(text: str, max_words: int, overlap_words: int) -> list[str]:
    """Word-boundary variant (reference chunk_by='words',
    context_windows.py:162-169): chunks of at most max_words tokens,
    each after the first starting with the previous chunk's last
    overlap_words tokens. Joining with single spaces normalizes intra-
    chunk whitespace (same as the reference's token join)."""
    if max_words <= overlap_words:
        raise ValueError("max_words must exceed overlap_words")
    words = text.split()
    if len(words) <= max_words:
        return [" ".join(words)] if words else [""]
    stride = max_words - overlap_words
    return [
        " ".join(words[start : start + max_words])
        for start in range(0, len(words) - overlap_words, stride)
    ]


def chunk_documents(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 2000,
    overlap: int = 200,
    by: str = "chars",
) -> ray.data.Dataset:
    """(id, chunk_index, chunk_text, n_chunk_chars) rows, one per
    chunk. by='chars' | 'words' (units of max_chars/overlap follow)."""
    if by not in ("chars", "words"):
        raise ValueError(f"by must be 'chars' or 'words', got {by!r}")
    split = chunk_text if by == "chars" else chunk_text_by_words

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, texts = [], [], []
        for did, t in zip(b[id_col], b[text_col]):
            cs = split(t, max_chars, overlap)
            ids.extend([did] * len(cs))
            idxs.extend(range(len(cs)))
            texts.extend(cs)
        return pd.DataFrame(
            {
                id_col: ids,
                "chunk_index": pd.array(idxs, dtype="int32"),
                "chunk_text": texts,
                "n_chunk_chars": pd.array([len(t) for t in texts], dtype="int64"),
            }
        )

    return ds.map_batches(expand, batch_format="pandas")
