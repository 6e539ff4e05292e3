"""Byte-pair-encoding tokenizer — learned subword units, Spark-scaled.

The text suite counts tokens with whitespace splits and a BPE-ish regex
(operators/text.py); a real training-data pipeline eventually needs the
learned thing itself: merges trained on ITS corpus, applied consistently
at encode time (token budgets, packing offsets and context windows all
shift when the tokenizer does).

Scale shape — the part worth getting right on Spark:

- TRAINING never iterates over the corpus. BPE's statistics live
  entirely in the word-frequency dictionary (Sennrich et al. 2016 train
  on word counts, not running text), so the corpus collapses through ONE
  shuffle into (word, count) rows, the dictionary is capped to the
  top-`vocab_cap` words by mass (Zipf: a 1M-word cap covers essentially
  all token mass of any natural corpus), and the merge loop runs
  driver-side over that bounded dict — the same bounded-sample-to-driver
  pattern as the IVF quantizer's Lloyd step. 100 TB of text and 100 GB
  of text train through the identical plan; only the one aggregation
  scales.
- ENCODING is map-only: merge ranks broadcast in the UDF closure, one
  mapInPandas pass, and a per-batch word cache (Zipf again: most words
  repeat) so the greedy merge loop runs once per DISTINCT word per
  batch, not once per occurrence. The per-OCCURRENCE python loop was
  measured, not assumed, to be fine: on a 200k-doc corpus at 8 cores it
  encodes ~180k docs/s (min-of-3, warm), and an explode/groupby
  pandas-vectorized variant measured SLOWER (~155k — the dict-hit +
  list-extend per occurrence is cheaper than exploding the word arrays
  through pandas). Earlier sub-4k docs/s readings came from a 5k-doc
  corpus where per-job overhead dominates, not from this loop.

Determinism: merge selection breaks frequency ties on the
lexicographically smallest pair, and the dictionary cap breaks count
ties on the word — training is a pure function of the corpus' word
multiset, invariant to partitioning (tested). Whitespace pre-splitting
matches the rest of the engine (`_tokens`); merges never cross word
boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feasts_spark.operators.text import _tokens


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the whitespace-token multiset — one shuffle,
    vocabulary-bounded output."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
    )


def _train_on_dict(freqs: list[tuple[str, int]], n_merges: int,
                   min_freq: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency dict. Pure python on
    a bounded input; pair stats update incrementally per merge — only
    pairs touched by the merged words are re-examined, and exhausted
    entries are deleted in place (no full-dict rebuild per merge).

    The per-merge argmax is a LAZY MAX-HEAP, not a dict scan: every
    pair-frequency update pushes a fresh (-freq, pair) entry and pops
    validate against the live dict (stale entries skip) — heap order
    (max freq, then lexicographically smallest pair) IS the selection
    rule, so the merge sequence is identical to the scan's (pinned by
    the textbook golden + determinism tests). Measured (bench.py
    --bpe-scale, BENCH_BPE.json): 8192 merges over a 100k-word Zipf
    vocabulary 211 s -> 22 s (371 merges/s), over 374k words
    672 s -> 101 s; the re-index loop over words containing the merged
    pair dominates what remains (early merges touch many words), which
    is inherent to BPE, not to this loop."""
    import heapq

    words = {w: (list(w), c) for w, c in freqs}
    # pair -> total freq, and pair -> set of words containing it
    pair_freq: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[str]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def _index(w, syms, c, sign, touched):
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_freq[p] = pair_freq.get(p, 0) + sign * c
            touched.add(p)
            if sign > 0:
                pair_words.setdefault(p, set()).add(w)

    init_touch: set = set()
    for w, (syms, c) in words.items():
        _index(w, syms, c, +1, init_touch)
    for p in init_touch:
        f = pair_freq.get(p, 0)
        if f >= min_freq:
            heap.append((-f, p))
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        nf, best = heapq.heappop(heap)
        if pair_freq.get(best, 0) != -nf:
            # stale: the pair's frequency changed since this entry was
            # pushed; its CURRENT value (if still eligible) has a fresher
            # entry, pushed by the touched-set sweep below
            continue
        a, b = best
        merges.append(best)
        merged = a + b
        touched: set = set()
        for w in list(pair_words.get(best, ())):
            syms, c = words[w]
            _index(w, syms, c, -1, touched)
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, c)
            _index(w, out, c, +1, touched)
        touched.add(best)
        for p in touched:  # in-place cleanup of exhausted pairs only
            f = pair_freq.get(p, 0)
            if f <= 0:
                pair_freq.pop(p, None)
                pair_words.pop(p, None)
            elif f >= min_freq:
                heapq.heappush(heap, (-f, p))
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    vocab_cap: int = 1_000_000,
    min_freq: int = 2,
) -> DataFrame:
    """Train BPE merges on the corpus' word-frequency dictionary (module
    docstring). Returns a small (rank, left, right) DataFrame — persist
    it next to the corpus (it IS the tokenizer); feed it to
    `bpe_encode`. Stops early when no pair reaches `min_freq`."""
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    top = (
        word_freqs(df, text_col)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(vocab_cap)
        .collect()
    )
    merges = _train_on_dict([(r["word"], r["count"]) for r in top],
                            n_merges, min_freq)
    return df.sparkSession.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def _encode_word(word: str, ranks: dict) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_tokens: bool = False,
    word_cache_cap: int = 262_144,
) -> DataFrame:
    """Apply trained merges: (id, n_ws_tokens, n_bpe_tokens [, tokens]).

    Map-only mapInPandas; ranks broadcast in the closure (a tokenizer is
    tiny); distinct-word encode cache bounded at `word_cache_cap`
    entries per task (cleared on overflow — Zipf keeps the hit rate high
    either way, and a long-lived task can't grow the worker unboundedly).
    Words are pre-split JVM-SIDE with the engine's `_tokens` expression,
    so train and encode tokenize IDENTICALLY (Java `\\s`, not Python's
    unicode-aware str.split) and `n_ws_tokens` matches token_stats'
    convention (an empty doc counts one empty token; it encodes to zero
    BPE tokens). Unknown characters fall out as single-character
    tokens — BPE degrades, never fails."""
    ranks = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges.collect()
    }

    import pandas as pd

    def fn(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_ws, n_bpe, toks = [], [], []
            for ws in pdf["_ws"]:
                out: list[str] = []
                for w in ws:
                    if w == "":
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        if len(cache) >= word_cache_cap:
                            cache.clear()
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                n_ws.append(len(ws))
                n_bpe.append(len(out))
                toks.append(out)
            res = {
                "id": pdf["id"],
                "n_ws_tokens": pd.Series(n_ws, dtype="int64"),
                "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
            }
            if return_tokens:
                res["tokens"] = toks
            yield pd.DataFrame(res)

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"id {id_type}, n_ws_tokens long, n_bpe_tokens long"
    if return_tokens:
        schema += ", tokens array<string>"
    return df.select(
        F.col(id_col).alias("id"), _tokens(text_col).alias("_ws")
    ).mapInPandas(fn, schema=schema)
