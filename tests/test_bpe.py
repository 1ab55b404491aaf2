"""BPE merge training (operators/bpe.py): parity with a pure-Python
reference implementation, deterministic tie-breaks, and exhaustion
behavior when the vocabulary runs out of pairs."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from jly_flink_spark.operators.bpe import bpe_train_merges


def _ref_bpe(word_counts: dict[str, int], rounds: int):
    """Reference greedy BPE: (round, a, b, count) merges."""
    st = [(list(w), c) for w, c in word_counts.items()]
    merges = []
    for r in range(1, rounds + 1):
        pc: Counter = Counter()
        for syms, c in st:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), n = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((r, a, b, n))
        nxt = []
        for syms, c in st:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt.append((out, c))
        st = nxt
    return merges


def _run(spark, texts, rounds):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bpe_train_merges(docs, rounds=rounds).collect()
    return sorted(
        (r["round"], r["merge_a"], r["merge_b"], r["pair_count"])
        for r in rows
    )


def _wc(texts):
    wc: Counter = Counter()
    for t in texts:
        wc.update(w for w in t.lower().split(" ") if w)
    return dict(wc)


def test_bpe_matches_reference(spark):
    texts = [
        "low lower lowest newer newest wider wide",
        "low low lower newer new news",
        "the the the them theme these",
    ]
    got = _run(spark, texts, 6)
    want = _ref_bpe(_wc(texts), 6)
    assert got == want
    # sanity: at least one learned merge must build on an earlier one
    merged_syms = {a + b for _, a, b, _ in want}
    assert any(
        a in merged_syms or b in merged_syms for _, a, b, _ in want
    ), want


def test_bpe_tiebreak_is_lexicographic(spark):
    # (a,b) and (c,d) both count 2 — the smaller pair must win round 1
    got = _run(spark, ["ab cd ab cd"], 1)
    assert got == [(1, "a", "b", 2)]


def test_bpe_exhausts_gracefully(spark):
    # one two-char word: round 1 merges it, later rounds have no
    # pairs left → output stops (no crash, no phantom rows)
    got = _run(spark, ["ab ab ab"], 4)
    assert got == [(1, "a", "b", 3)]


def test_bpe_tokenize_matches_reference_apply(spark):
    from jly_flink_spark.operators.bpe import bpe_tokenize_stats

    texts = [
        "low lower lowest newer newest",
        "wide wider new news newer low",
        "",  # token-less doc must drop from the output
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bpe_tokenize_stats(docs, rounds=4).collect()}
    merges = _ref_bpe(_wc(texts), 4)
    ref_merges = [(a, b) for _, a, b, _ in merges]

    def apply_word(w):
        syms = list(w)
        for a, b in ref_merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return len(syms)

    assert set(rows) == {0, 1}
    for i in (0, 1):
        words = [w for w in texts[i].lower().split(" ") if w]
        assert rows[i]["n_ws_tokens"] == len(words)
        assert rows[i]["n_bpe_tokens"] == sum(apply_word(w) for w in words)
        # invariants: BPE never splits below one symbol per word and
        # never exceeds character count
        assert (
            len(words)
            <= rows[i]["n_bpe_tokens"]
            <= sum(len(w) for w in words)
        )


@pytest.mark.parametrize("rounds", [0, -1])
def test_bpe_rejects_bad_rounds(spark, rounds):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train_merges(docs, rounds=rounds)


class TestUnigramLM:
    """Unigram-LM tokenizer (operators/unigram.py) — the EM-trained
    companion of the BPE trainer."""

    def test_viterbi_picks_cheapest_segmentation(self, spark):
        """DP correctness against a hand-built cost map: the cheapest
        path wins over both the all-chars and the greedy-longest
        segmentations."""
        from pyspark.sql import functions as F

        from jly_flink_spark.operators.unigram import (
            UNI_ENC,
            viterbi_struct,
        )

        # 'abc': chars cost 10+12+9=31, 'ab'+'c' = 15+9=24 (wins),
        # 'a'+'bc' = 10+30=40
        cm = {"a": 10, "b": 12, "c": 9, "ab": 15, "bc": 30}
        one = spark.createDataFrame([("abc",)], "word string").select(
            "word",
            F.map_from_entries(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("piece"),
                            F.lit(v * UNI_ENC + 1)
                            .cast("bigint")
                            .alias("enc"),
                        )
                        for k, v in cm.items()
                    ]
                )
            ).alias("cm"),
        )
        row = one.select(
            viterbi_struct(F.col("word"), F.col("cm")).alias("s")
        ).head()["s"]
        assert row["ps"] == ["ab", "c"]
        assert row["c"] == (15 + 9) * UNI_ENC + 2

    def test_train_pieces_em_moves_mass(self, spark):
        """On a corpus dominated by one bigram, training must keep
        the multi-char piece competitive: the seed contains it and
        the EM counts concentrate on pieces the Viterbi paths use
        (unused pieces drop to cnt 0 but stay, add-1 smoothed)."""
        from jly_flink_spark.operators.unigram import (
            unigram_train_pieces,
        )

        docs = spark.createDataFrame(
            [(i, "ababab cd") for i in range(30)],
            "doc_id long, text string",
        )
        rows = {
            r["piece"]: r for r in unigram_train_pieces(docs).collect()
        }
        # every single char survives; the dominant substring seeded
        assert {"a", "b", "c", "d"} <= set(rows)
        assert any(len(p) > 1 and rows[p]["cnt"] > 0 for p in rows)
        # cost ordering: a used piece is cheaper than an unused one
        used = min(
            (r for r in rows.values() if r["cnt"] > 0),
            key=lambda r: r["cost_micro"],
        )
        unused = [r for r in rows.values() if r["cnt"] == 0]
        assert all(used["cost_micro"] < u["cost_micro"] for u in unused)

    def test_tokenize_stats_consistency(self, spark):
        """Apply-side invariants: piece count ≥ word count (a word is
        ≥1 piece), nll positive, token-less docs dropped."""
        from jly_flink_spark.operators.unigram import (
            unigram_tokenize_stats,
        )

        docs = spark.createDataFrame(
            [(1, "hello world hello"), (2, "   "), (3, "xyz")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in unigram_tokenize_stats(docs).collect()
        }
        assert set(rows) == {1, 3}
        assert rows[1]["n_ws_tokens"] == 3
        assert rows[1]["n_uni_tokens"] >= rows[1]["n_ws_tokens"]
        assert rows[1]["nll_micro"] > 0
