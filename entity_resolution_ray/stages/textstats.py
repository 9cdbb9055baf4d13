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


class WinnowFingerprints:
    """Winnowing document fingerprinter (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every ``shingle``-word gram,
    slide a ``window`` over consecutive gram hashes, keep each window's
    minimum; the distinct minima are the document's fingerprint set.  Any
    two documents sharing a run of ``shingle + window - 1`` words are
    guaranteed to share a fingerprint, so equal-fingerprint buckets are
    near-dup candidates at ~1/window the cost of keeping every gram.

    The gram hash is md5-lower-64 (DuckDB's ``md5_number_lower``) so the
    whole operator reproduces bit-for-bit in the SQL oracle — same trade
    as SimHash (functions/minhash.py): any 64-bit hash gives equivalent
    selectivity; this one buys a correctness oracle."""

    def __init__(self, shingle: int = 3, window: int = 4):
        from entity_resolution_ray.utils.hashing import md5_hash64_array

        self.shingle = shingle
        self.window = window
        self._hash = md5_hash64_array

    def _doc_fingerprints(self, text: str) -> np.ndarray:
        toks = tokenize_words(text or "")
        k, w = self.shingle, self.window
        m = len(toks) - k + 1
        if m <= 0:
            return np.empty(0, dtype=np.uint64)
        h = self._hash([" ".join(toks[i:i + k]) for i in range(m)])
        if m >= w:
            mins = np.minimum.reduce([h[j:m - w + 1 + j] for j in range(w)])
        else:
            mins = h.min(keepdims=True)
        return np.unique(mins)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_ids: list = []
        out_fps: list[np.ndarray] = []
        for i, text in enumerate(batch["text"].to_pylist()):
            fps = self._doc_fingerprints(text)
            if len(fps):
                out_ids.append(np.repeat(ids[i], len(fps)))
                out_fps.append(fps)
        if not out_ids:
            return pa.table({
                "doc_id": pa.array([], batch["doc_id"].type),
                "fingerprint": pa.array([], pa.uint64()),
            })
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_ids)).cast(batch["doc_id"].type),
            "fingerprint": pa.array(np.concatenate(out_fps), pa.uint64()),
        })


def winnow_fingerprints(ds, shingle: int = 3, window: int = 4,
                        concurrency=(1, 8), batch_size: int = 2048):
    """Exploded (doc_id, fingerprint) winnowing table — the input to
    shared-fingerprint near-dup candidate joins and plagiarism-style
    containment checks."""
    return ds.map_batches(
        WinnowFingerprints,
        fn_constructor_kwargs={"shingle": shingle, "window": window},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


class RepetitionStats:
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
    per-document duplicate-word fraction and the character fraction covered
    by the most frequent word 2-gram / 3-gram.  High values flag
    boilerplate/spam documents a training-data pipeline should drop.

    Deterministic top-gram tie-break: among equal-count grams the
    lexicographically smallest wins — the property that lets a SQL oracle
    reproduce the metric bit-for-bit."""

    @staticmethod
    def _round6(x: float) -> float:
        # DuckDB round() is half-away-from-zero; python round() is banker's
        # (0.0390625 -> 0.039062 vs SQL 0.039063), so match SQL explicitly
        return float(np.floor(x * 1e6 + 0.5) / 1e6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        n_rows = len(batch)
        dup_frac = np.zeros(n_rows, np.float64)
        top2 = np.zeros(n_rows, np.float64)
        top3 = np.zeros(n_rows, np.float64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = tokenize_words(text or "")
            n = len(toks)
            if n == 0:
                continue
            total_chars = sum(len(t) for t in toks)
            dup_frac[i] = self._round6(1.0 - len(set(toks)) / n)
            for k, out in ((2, top2), (3, top3)):
                if n < k or total_chars == 0:
                    continue
                grams = [" ".join(toks[j:j + k]) for j in range(n - k + 1)]
                cnt = Counter(grams)
                best = min(g for g, c in cnt.items()
                           if c == max(cnt.values()))
                out[i] = self._round6(
                    cnt[best] * (len(best) - (k - 1)) / total_chars)
        return pa.table({
            "doc_id": batch["doc_id"],
            "dup_word_frac": pa.array(dup_frac, pa.float64()),
            "top2gram_frac": pa.array(top2, pa.float64()),
            "top3gram_frac": pa.array(top3, pa.float64()),
        })


def repetition_stats(ds, concurrency=(1, 8), batch_size: int = 2048):
    """Streaming per-doc repetition-quality columns — no shuffle."""
    return ds.map_batches(
        RepetitionStats, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


class UnigramNLL:
    """Unigram language-model scorer — the CCNet-style quality proxy
    (Wenzek et al. 2020 use a KenLM 5-gram; the distributable skeleton is
    identical): score(doc) = mean over tokens of -ln p(token), with p
    fitted on the corpus itself (``fit_unigram_counts``).  High mean-NLL
    flags gibberish / rare-vocabulary documents; low flags boilerplate.

    The fitted vocabulary is broadcast once (``ray.put``) and resolved in
    each actor's ``__init__`` — per-actor, not per-batch.  Every token is
    in-vocabulary by construction (the fit ran over the same corpus), so
    there is no smoothing term and the SQL oracle is an exact join.

    Float parity with the DuckDB oracle: per-token NLL is
    ``ln(total/cnt)`` computed in float64 via libm on both engines;
    per-doc mean/max round half-away-from-zero to 6 decimals
    (``RepetitionStats._round6`` convention).
    """

    def __init__(self, vocab_ref, total: int):
        import math

        import ray

        vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) else vocab_ref
        t = float(total)
        self.nll = {tok: math.log(t / cnt) for tok, cnt in vocab.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        r6 = RepetitionStats._round6
        ids, n_tok, mean_nll, max_nll = [], [], [], []
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = tokenize_words(text or "")
            if not toks:
                continue  # SQL inner join: token-less docs emit no row
            vals = [self.nll[t] for t in toks]
            ids.append(doc_ids[i])
            n_tok.append(len(vals))
            mean_nll.append(r6(sum(vals) / len(vals)))
            max_nll.append(r6(max(vals)))
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, dtype=doc_ids.dtype)),
            "token_count": pa.array(np.asarray(n_tok, np.int64)),
            "mean_nll": pa.array(np.asarray(mean_nll, np.float64)),
            "max_nll": pa.array(np.asarray(max_nll, np.float64)),
        })


def fit_unigram_counts(ds, num_buckets: int = 32) -> tuple[dict, int]:
    """Distributed unigram count fit: per-batch ``Counter`` partials (one
    row per distinct token per batch — the combiner that keeps the shuffle
    vocabulary-sized, not corpus-sized) merged by a bucketed exact groupby.

    The merged vocabulary is collected to the driver and broadcast; by
    Heaps' law it grows sublinearly (~100M types at 100 TB ≈ a few GB —
    still a feasible ``ray.put``).  Beyond that, swap the broadcast for a
    ``hash_join`` of the exploded token table against the vocab Dataset;
    the fit side is unchanged.
    """
    from collections import Counter

    from entity_resolution_ray.stages.aggregate import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(tokenize_words(text or ""))
        return pa.table({
            "tok": pa.array(list(c.keys()), pa.string()),
            "cnt": pa.array(np.fromiter(c.values(), np.int64, len(c))),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
    vocab_df = grouped_aggregate(
        partials, "tok", {"cnt": ("cnt", "sum")}, num_buckets=num_buckets
    ).to_pandas()  # vocabulary-sized, bounded (see docstring)
    total = int(vocab_df["cnt"].sum())
    return dict(zip(vocab_df["tok"], vocab_df["cnt"].astype(int))), total


def unigram_nll(ds, vocab: dict, total: int, concurrency=(1, 8),
                batch_size: int = 2048):
    """Per-doc (token_count, mean_nll, max_nll) via broadcast vocab."""
    import ray

    ref = ray.put({t: int(c) for t, c in vocab.items()})
    return ds.map_batches(
        UnigramNLL, fn_constructor_kwargs={"vocab_ref": ref, "total": total},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
