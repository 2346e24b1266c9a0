"""BPE merge learning vs a pure-Python Sennrich-style reference trainer."""

from __future__ import annotations

from collections import Counter

from kaminpar_spark.functions.bpe import END_WORD, bpe_apply, bpe_learn


def _py_bpe(texts, rounds):
    """Reference trainer: word-freq dict, greedy left-to-right merge, ties
    broken by (count desc, left asc, right asc)."""
    words = Counter(w for t in texts for w in t.split() if w)
    seqs = {w: [*w, END_WORD] for w in words}
    out = []
    for r in range(1, rounds + 1):
        pairs = Counter()
        for w, toks in seqs.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += words[w]
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, toks in seqs.items():
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            seqs[w] = new
        total = sum(words[w] * len(toks) for w, toks in seqs.items())
        out.append((r, a, b, cnt, total))
    return out, seqs, words


TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "a hat and a mat and a cat",
    "that hat is the hat",
    "aaaa aaa aa a",  # overlapping-run stress: greedy parity matters
]


def test_learn_matches_python_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn(docs, rounds=5).collect()]
    want, _, _ = _py_bpe(TEXTS, 5)
    assert got == want


def test_apply_matches_learned_segmentation(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    learned = bpe_learn(docs, rounds=4).collect()
    merges = [(r["merge_left"], r["merge_right"]) for r in learned]
    _, seqs, _ = _py_bpe(TEXTS, 4)
    toks = {
        r["doc_id"]: r["toks"]
        for r in bpe_apply(docs, merges).select("doc_id", "toks").collect()
    }
    for i, t in enumerate(TEXTS):
        want = [tok for w in t.split() if w for tok in seqs[w]]
        assert toks[i] == want, f"doc {i}"
