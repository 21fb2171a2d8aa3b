"""Distributed BPE tokenizer training over the documents corpus.

How real systems train BPE at scale (HF tokenizers, SentencePiece on
large corpora): the CORPUS-sized work is one aggregation — distinct
words with occurrence counts — and the merge-rule induction runs on
that word-count table, whose size is vocabulary-scale (and capped by
``max_words``), not corpus-scale. So the Spark side is a single
partial+final hash agg with an optional deterministic top-K
(:func:`word_counts`, oracle query ``bpe_word_counts``), and
:func:`train_bpe` is a driver-side exact implementation of Sennrich
et al. (ACL 2016) over the collected counts — collecting a
vocabulary-bounded table is the standard shape, not a scale bug.

Applying the learned merges back to the corpus (:func:`bpe_segment`)
is embarrassingly parallel: ``mapInPandas`` with a per-batch memo over
distinct words (Zipf makes the memo hit rate ~99%); no shuffle.

Determinism: merge selection ties break by (count desc, pair
lexicographically asc); word segmentation is greedy lowest-rank-first,
ties by leftmost position — so the same counts always yield the same
tokenizer, and re-runs are exact.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker glued to a word's last symbol (Sennrich-style).
EOW = "</w>"


def word_counts(docs: DataFrame, max_words: int | None = None) -> DataFrame:
    """(word, cnt) — distinct lower-cased whitespace words with
    occurrence counts; the one corpus-sized pass of BPE training.
    ``max_words`` keeps the top-K by (cnt desc, word asc) — the
    vocabulary cap that bounds driver memory at web scale."""
    wc = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    if max_words is not None:
        # orderBy().limit(K) plans as TakeOrderedAndProject — each
        # partition keeps its local top-K and the driver merges — where
        # a row_number() over a global Window would funnel the whole
        # vocabulary through ONE partition
        wc = wc.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(
            max_words
        )
    return wc


def word_counts_sql(max_words: int | None = None) -> str:
    """DuckDB twin of :func:`word_counts` over the `documents` view."""
    base = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
      FROM documents)
WHERE word <> ''
GROUP BY 1
"""
    if max_words is None:
        return base
    return f"""
SELECT word, cnt FROM (
  SELECT word, cnt,
         row_number() OVER (ORDER BY cnt DESC, word ASC) AS rnk
  FROM ({base})
) WHERE rnk <= {max_words}
"""


def _symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: characters, EOW glued to the last."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def train_bpe(
    counts: Sequence[tuple[str, int]] | DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a word-count table (list of
    (word, cnt) or the :func:`word_counts` DataFrame — collected here;
    vocabulary-bounded by construction). Returns merges in rank order.

    Exact Sennrich induction with incremental pair-count maintenance:
    each merge only touches the words that contain the merged pair, so
    training is O(Σ |word| + n_merges · touched), not
    O(n_merges · vocabulary).
    """
    if isinstance(counts, DataFrame):
        counts = [(r["word"], r["cnt"]) for r in counts.collect()]
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, c in counts:
        s = _symbols(w)
        if s:
            words.append(list(s))
            freqs.append(int(c))
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for i, (sym, c) in enumerate(zip(words, freqs)):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += c
            where.setdefault((a, b), set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # ties: count desc, then pair lexicographic asc — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in list(where.get(best, ())):
            sym, c = words[i], freqs[i]
            # remove this word's pair contributions, rewrite, re-add
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                s = where.get((a, b))
                if s is not None:
                    s.discard(i)
                    if not s:
                        del where[(a, b)]
            out: list[str] = []
            j = 0
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == best[0]
                    and sym[j + 1] == best[1]
                ):
                    out.append(joined)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += c
                where.setdefault((a, b), set()).add(i)
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE segmentation of one word: repeatedly merge the
    lowest-rank (earliest-learned) pair present, leftmost on rank
    ties — the exact HF/GPT-2 apply semantics."""
    sym = list(_symbols(word))
    while len(sym) > 1:
        best_rank, best_j = None, -1
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        sym[best_j : best_j + 2] = [sym[best_j] + sym[best_j + 1]]
    return sym


def bpe_segment(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, pieces: array<string>, n_pieces) — the corpus encoded
    with the learned merges. One ``mapInPandas`` pass, no shuffle; a
    per-batch memo over distinct words amortizes segmentation (Zipf →
    most occurrences hit the memo). The merge list rides the closure
    (rule table is tokenizer-sized, broadcast-class data)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in str(text).lower().split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = segment_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            pieces = pdf["text"].map(enc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(str),
                    "pieces": pieces,
                    "n_pieces": pieces.map(len).astype("int64"),
                }
            )

    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    ).mapInPandas(
        run, "doc_id string, pieces array<string>, n_pieces long"
    )
