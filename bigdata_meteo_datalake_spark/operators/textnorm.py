"""Unicode text normalization — the first text-cleaning pass every LLM
corpus runs: NFKC compatibility normalization (composing combining
sequences, expanding ligatures, folding fullwidth forms — the
spellings that make 'identical' strings hash differently and wreck
exact dedup) followed by control/format-character stripping (NUL,
zero-width spaces, BOM leftovers, bidi controls — the invisible bytes
that poison tokenizers), with newline and tab preserved as the two
layout characters downstream chunkers rely on.

Everything is stdlib ``unicodedata``; the per-exemplar behavior (which
compatibility mappings fire, which categories strip) is hash-gated by
the fixture oracle rather than trusted
(queries/ext_multimodal.py:unicode_clean_report).

Reference parity note: the reference pipeline stores raw JSONB text
with no normalization layer (SURVEY.md section 4); this belongs to the
training-data pillar.
"""

from __future__ import annotations

import unicodedata

__all__ = ["clean_unicode"]

_KEEP = "\n\t"


def clean_unicode(s: str) -> dict:
    """str -> {text, n_removed, changed}: NFKC then strip Cc/Cf
    characters (except newline and tab). ``changed`` compares against
    the RAW input, so a pure composition change (no removals) still
    flags."""
    n = unicodedata.normalize("NFKC", s)
    cleaned = "".join(
        c for c in n
        if unicodedata.category(c) not in ("Cc", "Cf") or c in _KEEP
    )
    return {
        "text": cleaned,
        "n_removed": len(n) - len(cleaned),
        "changed": cleaned != s,
    }


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_dirty_text(df):
    """Deterministic denormalized-text source cycling five real-world
    mojibake/denormalization classes by doc_id % 5:

      0: precomposed 'café {doc_id}' (already NFC — must pass through)
      1: combining-accent 'cafe<U+0301> {doc_id}' (NFKC composes)
      2: ligature '<U+FB01>le {doc_id}' (NFKC expands to 'file')
      3: fullwidth '<U+FF21><U+FF22> {doc_id}' (NFKC folds to 'AB')
      4: 'a<NUL>b<ZWSP> {doc_id}' (control + format chars stripped)

    — expected cleaned strings the oracle states literally
    (queries/ext_multimodal.py:unicode_clean_report)."""
    import pandas as pd

    from ..sources.lake import widen

    templates = [
        "caf\u00e9 {d}",        # precomposed e-acute (already NFC)
        "cafe\u0301 {d}",       # e + combining acute (NFKC composes)
        "\ufb01le {d}",          # fi ligature (NFKC expands)
        "\uff21\uff22 {d}",     # fullwidth A, B (NFKC folds)
        "a\u0000b\u200b {d}",   # NUL (Cc) + zero-width space (Cf)
    ]

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "raw": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                out["doc_id"].append(did)
                out["raw"].append(templates[did % 5].format(d=did))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, raw string"
    )


def unicode_clean_features(df):
    """(doc_id, raw) -> (doc_id, text_clean, n_chars, n_removed,
    changed) via mapInPandas."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "text_clean", "n_chars",
                                   "n_removed", "changed")}
            for doc_id, raw in zip(pdf["doc_id"], pdf["raw"]):
                r = clean_unicode(str(raw))
                out["doc_id"].append(doc_id)
                out["text_clean"].append(r["text"])
                out["n_chars"].append(len(r["text"]))
                out["n_removed"].append(r["n_removed"])
                out["changed"].append(r["changed"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "raw").mapInPandas(
        kernel,
        "doc_id long, text_clean string, n_chars long, n_removed int, "
        "changed boolean",
    )
