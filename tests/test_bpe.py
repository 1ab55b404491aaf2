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
