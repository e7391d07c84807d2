"""Property suite for the round-8 exact-batching rule
(pipeline/bpe._accept_batch): a pure-Python batched trainer built on
the SAME acceptance function must reproduce the sequential greedy
reference (_train_local) bit-for-bit on thousands of adversarial
random vocabularies — no Spark in the loop, so hypothesis can
actually explore the space (hot pairs sharing tokens, ties broken
lexicographically, merged-symbol collisions like 'a'+'b' vs an
existing 'ab' token, single-letter self-pairs 'aa')."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from seqtables_spark.pipeline.bpe import (
    _accept_batch,
    _merge_tokens,
    _train_local,
)


def _pair_counts(vocab: dict) -> dict:
    pairs: dict = {}
    for toks, c in vocab.items():
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            pairs[p] = pairs.get(p, 0) + c
    return pairs


def _train_local_batched(vocab: dict, num_merges: int, batch: int) -> list[dict]:
    """Mirror of train_bpe's distributed batched loop, driven entirely
    by _accept_batch over exact pair tables."""
    rules: list[dict] = []
    while len(rules) < num_merges:
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        want = min(batch, num_merges - len(rules))
        ordered = sorted(
            ((l, r, c) for (l, r), c in pairs.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        top = ordered[:want]
        if want > 1 and len(top) > 1:
            max_l: dict = {}
            max_r: dict = {}
            for (l, r), c in pairs.items():
                if c > max_l.get(l, 0):
                    max_l[l] = c
                if c > max_r.get(r, 0):
                    max_r[r] = c
            accepted = _accept_batch(top, max_l, max_r)
        else:
            accepted = top[:1]
        for l, r, c in accepted:
            rules.append(
                {
                    "merge_rank": len(rules) + 1,
                    "lhs": l,
                    "rhs": r,
                    "pair_count": int(c),
                }
            )
            new: dict = {}
            for toks, cnt in vocab.items():
                m = _merge_tokens(toks, l, r)
                new[m] = new.get(m, 0) + cnt
            vocab = new
    return rules


# Tiny alphabets + short words force dense pair interactions: shared
# tokens between hot pairs, frequent ties, and early merged-symbol
# collisions — exactly the cases the safety prefix must refuse.
words = st.text(alphabet="abc", min_size=1, max_size=6)
vocabs = st.dictionaries(
    st.tuples(words).map(lambda t: tuple(t[0])),  # word -> char tuple
    st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=12,
).map(lambda d: {tuple(k): v for k, v in d.items()})


@settings(max_examples=1500, deadline=None)
@given(
    vocab=vocabs,
    num_merges=st.integers(min_value=1, max_value=12),
    batch=st.integers(min_value=2, max_value=6),
)
def test_batched_equals_sequential(vocab, num_merges, batch):
    assert _train_local_batched(dict(vocab), num_merges, batch) == _train_local(
        dict(vocab), num_merges
    )


@settings(max_examples=500, deadline=None)
@given(vocab=vocabs, num_merges=st.integers(min_value=1, max_value=10))
def test_batch_one_is_sequential(vocab, num_merges):
    """batch=1 through the same driver loop is trivially the
    sequential algorithm (guards the loop refactor itself)."""
    assert _train_local_batched(dict(vocab), num_merges, 1) == _train_local(
        dict(vocab), num_merges
    )


def test_accept_batch_known_refusals():
    """Hand-built cases pinning each stop condition individually."""
    # (b) created-pair bound: merging (t,h) can create (th,e) bounded
    # by max_r?? no — bounded by count(h,e)=5 > candidate (x,y)=4
    top = [("t", "h", 9), ("x", "y", 4)]
    max_l = {"t": 9, "h": 5, "x": 4}
    max_r = {"h": 9, "y": 4, "e": 5}
    # bound after (t,h) = max(max_l['h']=5, max_r['t']=0) = 5 >= 4
    assert _accept_batch(top, max_l, max_r) == [("t", "h", 9)]
    # (a) token sharing stops the prefix
    top = [("a", "b", 9), ("b", "c", 8), ("d", "e", 7)]
    assert _accept_batch(top, {}, {}) == [("a", "b", 9)]
    # (c) merged-symbol collision ('ab' already a live pair token)
    top = [("a", "b", 9), ("c", "d", 3)]
    assert _accept_batch(top, {"ab": 2}, {}) == [("a", "b", 9)]
    # clean disjoint prefix is accepted whole
    top = [("a", "b", 9), ("c", "d", 8), ("e", "f", 7)]
    got = _accept_batch(top, {"a": 9, "c": 8, "e": 7},
                        {"b": 9, "d": 8, "f": 7})
    assert got == top


def test_batched_equals_sequential_exhaustive_tiny():
    """EXHAUSTIVE sweep (not sampled): every multiset of up to 3
    distinct words drawn from the full enumeration of 'ab'-alphabet
    words of length <= 4, with counts in {1, 2, 3}, batch sizes 2-4,
    8 merges. ~30k universes; any unsound acceptance in the prefix
    rule would surface here as a rule-table divergence."""
    from itertools import combinations, product

    all_words = [
        tuple(w)
        for n in range(1, 5)
        for w in map("".join, product("ab", repeat=n))
    ]
    checked = 0
    for pick in combinations(range(len(all_words)), 2):
        for counts in product((1, 2, 3), repeat=2):
            vocab = {all_words[i]: c for i, c in zip(pick, counts)}
            seq = _train_local(dict(vocab), 8)
            for batch in (2, 4):
                assert _train_local_batched(dict(vocab), 8, batch) == seq, vocab
            checked += 1
    # a denser 3-word slice over the short words, all count mixes
    short = [w for w in all_words if len(w) <= 3]
    for pick in combinations(range(len(short)), 3):
        for counts in product((1, 2, 3), repeat=3):
            vocab = {short[i]: c for i, c in zip(pick, counts)}
            seq = _train_local(dict(vocab), 8)
            assert _train_local_batched(dict(vocab), 8, 3) == seq, vocab
            checked += 1
    assert checked > 13_000  # 435*9 two-word + 364*27 three-word universes
