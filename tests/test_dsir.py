"""DSIR hashed importance weights (operators/text.py dsir_weights).

Expected values recomputed in pure Python (hashlib md5 + math.log) —
independent arithmetic from both Spark and the DuckDB oracle, so a
shared-formula bug in the SQL transcription shows up here.
"""

import hashlib
import math

from clever_canal_spark.operators.text import dsir_weights

B = 1024


def _bucket(tok: str) -> int:
    return int(hashlib.md5(f"dsir:{tok}".encode()).hexdigest()[:8], 16) % B


def _e9(x: float) -> int:
    v = x * 1e9
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _expected(rows):
    inst = {}  # (doc, b) -> n
    for doc_id, text in rows:
        for tok in text.split():
            k = (doc_id, _bucket(tok))
            inst[k] = inst.get(k, 0) + 1
    n_t = sum(n for (d, _), n in inst.items() if d % 5 == 0)
    n_r = sum(n for (d, _), n in inst.items() if d % 5 != 0)
    c_t, c_r = {}, {}
    for (d, b), n in inst.items():
        side = c_t if d % 5 == 0 else c_r
        side[b] = side.get(b, 0) + n
    out = {}
    for (d, b), n in inst.items():
        d_e9 = _e9(
            math.log((c_t.get(b, 0) + 1.0) / (n_t + float(B)))
            - math.log((c_r.get(b, 0) + 1.0) / (n_r + float(B)))
        )
        tok_sum, w_sum = out.get(d, (0, 0))
        out[d] = (tok_sum + n, w_sum + n * d_e9)
    return out


def test_hand_computed_weights(spark):
    rows = [
        (0, "alpha beta alpha gamma"),   # target split
        (5, "alpha beta beta"),          # target split
        (1, "alpha delta delta"),        # raw: shares alpha, adds delta
        (2, "epsilon zeta zeta zeta"),   # raw-only vocab
        (3, "alpha beta gamma"),         # raw doc made of target vocab
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["lw_sum_e9"])
           for r in dsir_weights(df).collect()}
    assert got == _expected(rows)
    # direction sanity: the target-vocab raw doc outranks the raw-only one
    # per token
    n3, w3 = got[3]
    n2, w2 = got[2]
    assert w3 / n3 > w2 / n2


def test_empty_docs_absent(spark):
    df = spark.createDataFrame(
        [(0, "tok tok"), (1, ""), (2, "   ")], "doc_id bigint, text string"
    )
    ids = {r["doc_id"] for r in dsir_weights(df).collect()}
    assert ids == {0}
