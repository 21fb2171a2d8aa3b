"""BPE tokenizer training (operators/bpe.py): Sennrich-example
exactness, incremental-count correctness vs a naive recount trainer,
apply semantics, and the Spark word-count/segment plumbing."""

from __future__ import annotations

from collections import Counter

from pyreshaper_spark.operators.bpe import (
    EOW,
    _symbols,
    bpe_segment,
    segment_word,
    train_bpe,
    word_counts,
)

# the classic corpus from Sennrich et al. (ACL 2016), §3 figure 1
SENNRICH = [
    ("low", 5),
    ("lower", 2),
    ("newest", 6),
    ("widest", 3),
]


def test_sennrich_first_merges():
    # hand-computed with EOW glued to the last char:
    #   (e,s)=9 ties (s,t</w>)=9 → lexicographic → (e,s)
    #   then (es,t</w>)=9, then (l,o)=7,
    #   then 6-way tie (e,w)/(n,e)/(w,est</w>) → lexicographic → (e,w)
    assert train_bpe(SENNRICH, 4) == [
        ("e", "s"),
        ("es", f"t{EOW}"),
        ("l", "o"),
        ("e", "w"),
    ]


def _naive_train(counts, n_merges):
    """Recount-everything reference trainer (O(n_merges · corpus))."""
    words = {i: list(_symbols(w)) for i, (w, _) in enumerate(counts)}
    freqs = {i: c for i, (_, c) in enumerate(counts)}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for i, sym in words.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += freqs[i]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for i, sym in words.items():
            out, j = [], 0
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == best[0]
                    and sym[j + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
    return merges


def test_incremental_matches_naive_recount():
    # deterministic pseudo-random corpora (no RNG: LCG over a tiny
    # alphabet so merges collide and tie-breaks are exercised)
    state = 12345
    words = []
    for n in range(60):
        state = (state * 1103515245 + 12345) % (1 << 31)
        ln = 1 + state % 6
        w = "".join(
            "abcd"[(state >> (3 * j)) % 4] for j in range(ln)
        )
        words.append((w, 1 + state % 9))
    # dedupe words (train_bpe assumes distinct words, as word_counts emits)
    seen = {}
    for w, c in words:
        seen[w] = seen.get(w, 0) + c
    corpus = sorted(seen.items())
    assert train_bpe(corpus, 25) == _naive_train(corpus, 25)


def test_segment_word_applies_rank_order():
    merges = train_bpe(SENNRICH, 10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # a trained word segments to one piece once enough merges exist
    assert segment_word("newest", ranks) == [f"newest{EOW}"]
    # unseen word falls back to learned subwords/chars, roundtrips
    pieces = segment_word("lowest", ranks)
    assert "".join(pieces).replace(EOW, "") == "lowest"
    assert len(pieces) > 1


def test_roundtrip_property():
    merges = train_bpe(SENNRICH, 6)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "wildest", "a", "zz"]:
        pieces = segment_word(w, ranks)
        assert "".join(pieces) == w + EOW
        assert all(p for p in pieces)


def test_spark_word_counts_and_segment(spark):
    docs = spark.createDataFrame(
        [("1", "low low lower"), ("2", "Newest newest  widest")],
        "doc_id string, text string",
    )
    wc = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert wc == {"low": 2, "lower": 1, "newest": 2, "widest": 1}
    top = word_counts(docs, max_words=2).collect()
    assert {r["word"] for r in top} == {"low", "newest"}

    merges = train_bpe(sorted(wc.items()), 8)
    out = {r["doc_id"]: r for r in bpe_segment(docs, merges).collect()}
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    want1 = (
        segment_word("low", ranks) * 2 + segment_word("lower", ranks)
    )
    assert list(out["1"]["pieces"]) == want1
    assert out["1"]["n_pieces"] == len(want1)
    # lower-casing + multi-space handling
    assert out["2"]["n_pieces"] == len(
        segment_word("newest", ranks) * 2 + segment_word("widest", ranks)
    )
