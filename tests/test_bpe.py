"""BPE induction correctness: hand-traced merges, determinism, and
distributed application roundtrip."""

from __future__ import annotations

from documentindex_spark.functions import bpe


def test_hand_traced_merges():
    """corpus 'aa ab aa': pairs (a,a):2 (a,</w>):2 (a,b):1 (b,</w>):1.
    Tie at freq 2 breaks lexicographically: '</w>' < 'a', so
    (a,</w>) merges first, then (a,a</w>); freq-1 pairs stop the loop."""
    merges = bpe.train_bpe([("aa", 2), ("ab", 1)], n_merges=10)
    assert merges == [("a", "</w>", 2), ("a", "a</w>", 2)]


def test_encode_word_follows_rank_order():
    ranks = {("a", "</w>"): 0, ("a", "a</w>"): 1}
    assert bpe._encode_word("aa", ranks) == ["aa</w>"]
    assert bpe._encode_word("ab", ranks) == ["a", "b", "</w>"]
    # greedy replay: (a,</w>) fires first, then (a,a</w>) — encoding
    # iterates until no ranked pair remains
    assert bpe._encode_word("aaa", ranks) == ["a", "aa</w>"]


def test_suffix_emerges_on_sennrich_corpus():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe(wf, n_merges=10)
    built = {l + r for l, r, _ in merges}
    assert "est</w>" in built  # the classic shared suffix
    assert "low" in built  # and the shared stem


def test_spark_induction_and_application(spark):
    docs = spark.createDataFrame(
        [(0, "aa ab"), (1, "aa aa ab"), (2, "aa")],
        "doc_id long, text string",
    )
    mdf = bpe.bpe_merges(docs, n_merges=10)
    merges = [
        (r["left"], r["right"])
        for r in mdf.orderBy("rank").collect()
    ]
    # word freqs: aa:4, ab:2 — same shape as the hand trace, so the
    # first merge is again (a, </w>) by the tie-break, and every
    # merge must have corpus freq >= 2
    assert merges[0] == ("a", "</w>")
    assert all(int(r["freq"]) >= 2 for r in mdf.collect())

    enc = bpe.apply_bpe(docs, merges).collect()
    # pieces of each (doc, word) concatenate back to word + '</w>'
    by_word: dict[tuple[int, int], list[tuple[int, str]]] = {}
    for r in enc:
        by_word.setdefault(
            (int(r["doc_id"]), int(r["word_ord"])), []
        ).append((int(r["piece_ord"]), r["piece"]))
    texts = {0: ["aa", "ab"], 1: ["aa", "aa", "ab"], 2: ["aa"]}
    for (did, word_ord), pieces in by_word.items():
        joined = "".join(p for _, p in sorted(pieces))
        assert joined == texts[did][word_ord] + bpe.END
    assert len(by_word) == 6  # every word of every doc encoded


def test_frequency_floor_and_topn_truncation(spark):
    """Scale-degradation policy (round-4 verdict #4): min_freq drops
    rare words before the collect; top_n_words keeps the N most
    frequent deterministically (freq desc, word asc); and the induced
    merges equal train_bpe on the truncated word table exactly."""
    docs = spark.createDataFrame(
        # freqs: aa:4, ab:2, zz:1  (zz below the floor)
        [(0, "aa ab zz"), (1, "aa aa ab"), (2, "aa")],
        "doc_id long, text string",
    )
    with_floor = [
        tuple(r)
        for r in bpe.bpe_merges(docs, 10, min_freq=2).orderBy("rank").collect()
    ]
    expected = [
        (i, l, r, f)
        for i, (l, r, f) in enumerate(
            bpe.train_bpe([("aa", 4), ("ab", 2)], 10)
        )
    ]
    assert with_floor == expected

    top1 = [
        tuple(r)
        for r in bpe.bpe_merges(docs, 10, top_n_words=1).orderBy("rank").collect()
    ]
    assert top1 == [
        (i, l, r, f)
        for i, (l, r, f) in enumerate(bpe.train_bpe([("aa", 4)], 10))
    ]


def test_vocab_over_collect_cap_degrades_not_refuses(spark):
    """A vocabulary larger than max_vocab_collect no longer raises:
    it auto-truncates to the top max_vocab_collect words by (freq
    desc, word asc) and induces merges from that table."""
    # 8 distinct words, freqs aa:4 bb:3 cc:2 dd..hh:1 — cap=3 keeps
    # exactly {aa, bb, cc}.
    rows = (
        [(i, "aa") for i in range(4)]
        + [(10 + i, "bb") for i in range(3)]
        + [(20 + i, "cc") for i in range(2)]
        + [(30, "dd ee ff gg hh")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        tuple(r)
        for r in bpe.bpe_merges(docs, 10, max_vocab_collect=3)
        .orderBy("rank")
        .collect()
    ]
    expected = [
        (i, l, r, f)
        for i, (l, r, f) in enumerate(
            bpe.train_bpe([("aa", 4), ("bb", 3), ("cc", 2)], 10)
        )
    ]
    assert got == expected


def test_determinism_across_partitionings(spark):
    a = spark.createDataFrame(
        [(0, "x y x"), (1, "y z")], "doc_id long, text string"
    ).repartition(1)
    b = spark.createDataFrame(
        [(0, "x y x"), (1, "y z")], "doc_id long, text string"
    ).repartition(7)
    ma = [tuple(r) for r in bpe.bpe_merges(a, 5).orderBy("rank").collect()]
    mb = [tuple(r) for r in bpe.bpe_merges(b, 5).orderBy("rank").collect()]
    assert ma == mb
