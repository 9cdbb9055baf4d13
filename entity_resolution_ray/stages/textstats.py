"""Text-analysis stages over a documents table (doc_id, text).

Large-scale training-data operators (not in the reference, which stops at NER
features): token counting, quality scoring, n-gram language-ID heuristic, and
document fingerprinting.  Every formula is chosen to be expressible 1:1 in
ANSI SQL so the DuckDB oracle can verify values exactly:

- tokens     = non-empty splits of lower(ascii text) on ``[^a-z0-9]+``
- ratios     = exact integer divisions (identical float64 in any engine)
- fingerprint = md5 of lower(text) with whitespace collapsed (DuckDB ``md5``)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from entity_resolution_ray.functions.text import normalize_ws_lower, tokenize_words
from entity_resolution_ray.utils.hashing import md5_hex

EN_STOPWORDS = [
    "the", "and", "of", "a", "to", "in", "for", "on", "with", "is", "was",
]
# a second "language" signature so the langid op has a real decision to make;
# on the synthetic corpus these are engine-vocabulary words standing in for
# another language's stopword list
XX_STOPWORDS = ["der", "und", "die", "das", "ein", "nicht", "mit", "von"]


class TextStats:
    """Actor-pool stage appending token/quality/langid/fingerprint columns."""

    def __init__(self):
        self.en = frozenset(EN_STOPWORDS)
        self.xx = frozenset(XX_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        token_count = np.zeros(n, dtype=np.int64)
        uniq_tokens = np.zeros(n, dtype=np.int64)
        char_count = np.zeros(n, dtype=np.int64)
        en_hits = np.zeros(n, dtype=np.int64)
        xx_hits = np.zeros(n, dtype=np.int64)
        stop_ratio = np.zeros(n, dtype=np.float64)
        avg_token_len = np.zeros(n, dtype=np.float64)
        lang_pred = np.empty(n, dtype=object)
        fingerprint = np.empty(n, dtype=object)
        for i, text in enumerate(texts):
            text = text or ""
            toks = tokenize_words(text)
            token_count[i] = len(toks)
            uniq_tokens[i] = len(set(toks))
            char_count[i] = len(text)
            en = sum(1 for t in toks if t in self.en)
            xx = sum(1 for t in toks if t in self.xx)
            en_hits[i] = en
            xx_hits[i] = xx
            if toks:
                stop_ratio[i] = en / len(toks)
                avg_token_len[i] = sum(len(t) for t in toks) / len(toks)
            lang_pred[i] = "en" if en >= xx and en > 0 else ("xx" if xx > 0 else "und")
            fingerprint[i] = md5_hex(normalize_ws_lower(text))
        return (
            batch.append_column("token_count", pa.array(token_count))
            .append_column("uniq_tokens", pa.array(uniq_tokens))
            .append_column("char_count", pa.array(char_count))
            .append_column("en_hits", pa.array(en_hits))
            .append_column("xx_hits", pa.array(xx_hits))
            .append_column("stop_ratio", pa.array(np.round(stop_ratio, 6)))
            .append_column("avg_token_len", pa.array(np.round(avg_token_len, 6)))
            .append_column("lang_pred", pa.array(lang_pred, pa.string()))
            .append_column("fingerprint", pa.array(fingerprint, pa.string()))
        )


def text_stats(ds, concurrency=(1, 8), batch_size: int = 2048):
    return ds.map_batches(
        TextStats, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def oracle_token_expr(col: str = "text") -> str:
    """The SQL expression matching ``tokenize_words`` (ascii corpus)."""
    return (
        f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x != '')"
    )
