"""CCNet-style bigram stupid-backoff LM scoring + tercile bucketing
(operators/text.py lm_bigram_scores / ccnet_buckets).

Hand-written expected values throughout — the driver oracle shares the
same algebra transcription, so shared-formula bugs can only be caught
here (the cdc_ddl_parse lesson from round 2).
"""

import math

from clever_canal_spark.operators.text import ccnet_buckets, lm_bigram_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _e9(x: float) -> int:
    # the operator's per-instance pin: ROUND half-away-from-zero
    v = x * 1e9
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_hand_computed_scores(spark):
    # train split = doc_id % 5 == 0 -> only doc 0.
    # doc 0: "a b a b"   bigrams: (a,b)x2, (b,a)x1
    # train unigrams: a:2 b:2, N=4; train bigrams: (a,b):2 (b,a):1
    rows = [
        (0, "a b a b"),
        (1, "a b c"),   # (a,b) seen; (b,c): backoff, c OOV
        (2, "b a"),     # (b,a) seen
        (3, "x"),       # <2 tokens: absent from output
    ]
    out = {
        r["doc_id"]: r
        for r in lm_bigram_scores(_docs(spark, rows)).collect()
    }
    assert set(out) == {0, 1, 2}

    lp_ab = _e9(math.log(2.0 / 2.0))          # ln(c2(a,b)/c1(a)) = 0
    lp_ba = _e9(math.log(1.0 / 2.0))
    lp_oov = _e9(math.log(0.4 / (4.0 + 1.0)))  # c unseen anywhere

    d0 = out[0]
    assert d0["n_bigrams"] == 3 and d0["n_backoff"] == 0
    assert d0["avg_nll_e9"] == (-(2 * lp_ab + lp_ba)) // 3

    d1 = out[1]
    assert d1["n_bigrams"] == 2 and d1["n_backoff"] == 1
    assert d1["avg_nll_e9"] == (-(lp_ab + lp_oov)) // 2

    d2 = out[2]
    assert d2["n_bigrams"] == 1 and d2["n_backoff"] == 0
    assert d2["avg_nll_e9"] == -lp_ba  # single instance


def test_backoff_unigram_branch(spark):
    # train doc 0 has tokens a,b,c but never bigram (c,a):
    # doc 1's (c,a) backs off to ln(0.4 * c1(a)/N)
    rows = [(0, "a b c"), (1, "c a")]
    out = {r["doc_id"]: r for r in lm_bigram_scores(_docs(spark, rows)).collect()}
    lp = _e9(math.log(0.4 * (1.0 / 3.0)))
    assert out[1]["n_backoff"] == 1
    assert out[1]["avg_nll_e9"] == -lp


def test_buckets_are_terciles_and_ordered(spark):
    # 9 docs, distinct scores -> 3 per bucket; head = lowest avg_nll.
    rows = [(i, " ".join(["tok%d" % (j % (i + 2)) for j in range(20)]))
            for i in range(9)]
    scored = ccnet_buckets(lm_bigram_scores(_docs(spark, rows)))
    got = scored.collect()
    assert len(got) == 9
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_nll_e9"])
    assert set(by_bucket) <= {"head", "middle", "tail"} and "head" in by_bucket
    # ordering invariant: head scores <= middle scores <= tail scores,
    # up to one bin width (ties share a bin share a bucket)
    order = [b for b in ("head", "middle", "tail") if b in by_bucket]
    for lo, hi in zip(order, order[1:]):
        assert max(by_bucket[lo]) <= min(by_bucket[hi]) + 10_000_000
    # head must hold at least a third (type-1 threshold reaches ceil(n/3))
    assert len(by_bucket["head"]) >= 3


def test_ties_share_bucket(spark):
    # identical docs -> identical scores -> one bin: everyone 'head'
    rows = [(i * 7 + 1, "a b a b") for i in range(6)]  # no doc in train split
    rows.append((0, "a b a b"))  # train doc so the LM is non-empty
    scored = ccnet_buckets(lm_bigram_scores(_docs(spark, rows)))
    assert {r["bucket"] for r in scored.collect()} == {"head"}
