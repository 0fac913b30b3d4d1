"""Unigram LM surprisal scorer (functions/lm_score.py)."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest


def _docs_ds(ray, texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        )
    )


def test_unigram_logprob_matches_hand_computation(ray_session):
    import ray

    from fuzi_rd.functions.lm_score import unigram_logprob

    texts = ["a a b", "b c", "a"]
    # corpus counts: a=3, b=2, c=1, total=6
    out = unigram_logprob(_docs_ds(ray, texts)).take_all()
    by_id = {r["doc_id"]: r for r in out}
    m = {
        "a": math.floor(-1000 * math.log(3 / 6)),
        "b": math.floor(-1000 * math.log(2 / 6)),
        "c": math.floor(-1000 * math.log(1 / 6)),
    }
    assert by_id[0]["surprisal_milli"] == 2 * m["a"] + m["b"]
    assert by_id[0]["n_tokens"] == 3
    assert by_id[0]["mean_surprisal_milli"] == (2 * m["a"] + m["b"]) // 3
    assert by_id[1]["surprisal_milli"] == m["b"] + m["c"]
    assert by_id[2]["surprisal_milli"] == m["a"]


def test_zero_token_docs_excluded(ray_session):
    import ray

    from fuzi_rd.functions.lm_score import unigram_logprob

    out = unigram_logprob(_docs_ds(ray, ["hello world", "", "   "])).take_all()
    assert [r["doc_id"] for r in out] == [0]


def test_top_k_cap_and_oov(ray_session):
    import ray

    from fuzi_rd.functions.lm_score import fit_unigram_vocab, unigram_logprob

    texts = ["common common common rare", "common unique"]
    # counts: common=4, rare=1, unique=1; total=6
    ds = _docs_ds(ray, texts)
    vocab, total = fit_unigram_vocab(ds, top_k=1)
    assert vocab == {"common": 4}
    assert total == 6  # total is pre-cap: retained probs unchanged
    out = unigram_logprob(ds, top_k=1).take_all()
    by_id = {r["doc_id"]: r for r in out}
    m_common = math.floor(-1000 * math.log(4 / 6))
    oov = math.floor(-1000 * math.log(1 / 6))
    assert by_id[0]["surprisal_milli"] == 3 * m_common + oov
    assert by_id[1]["surprisal_milli"] == m_common + oov


def test_default_fit_is_bounded(ray_session):
    """Production defaults must not ship the unbounded-driver-dict hazard:
    both fits default to a finite top_k, and a high-cardinality corpus fit
    with an explicit cap pulls at most cap entries to the driver."""
    import ray

    from fuzi_rd.functions.lm_score import (
        DEFAULT_TOP_K,
        fit_logodds_weights,
        fit_unigram_vocab,
    )

    assert DEFAULT_TOP_K is not None and DEFAULT_TOP_K > 0

    # 5000 distinct tokens, one common token to anchor determinism
    texts = [
        " ".join(f"tok{j}" for j in range(i * 50, (i + 1) * 50)) + " common"
        for i in range(100)
    ]
    ds = _docs_ds(ray, texts)
    vocab, total = fit_unigram_vocab(ds, top_k=64)
    assert len(vocab) <= 64
    assert total == 100 * 51  # total is pre-cap
    assert "common" in vocab  # most frequent survives the cap

    labeled = ds.map_batches(
        lambda b: b.append_column(
            "is_good", pa.array([bool(i % 2) for i in b.column("doc_id").to_pylist()])
        ),
        batch_format="pyarrow",
    )
    weights, oov = fit_logodds_weights(labeled, top_k=64)
    assert len(weights) <= 64
    # capped weights agree with the uncapped fit on every retained token
    full, oov_full = fit_logodds_weights(labeled, top_k=None)
    assert oov == oov_full
    assert all(full[t] == w for t, w in weights.items())
    # and they are the most discriminative ones ((-|w|, tok) order)
    expect = set(sorted(full, key=lambda t: (-abs(full[t]), t))[:64])
    assert set(weights) == expect


def test_degenerate_doc_scores_low(ray_session):
    """A doc repeating the corpus's most common token scores a lower mean
    surprisal than a doc of rare tokens — the signal the filter uses."""
    import ray

    from fuzi_rd.functions.lm_score import unigram_logprob

    texts = ["the " * 50, "zyzzyva qoph xylem"] + ["the quick brown fox"] * 10
    out = unigram_logprob(_docs_ds(ray, texts)).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["mean_surprisal_milli"] < by_id[1]["mean_surprisal_milli"]

def test_max_token_chars_drops_megatoken(ray_session):
    """The default cap excludes degenerate over-long tokens from both fit
    and score; passing None keeps them (oracle-exact mode)."""
    import ray

    from fuzi_rd.functions.lm_score import fit_unigram_vocab, unigram_logprob

    mega = "x" * 5000
    ds = _docs_ds(ray, [f"a {mega} b", "a b"])
    vocab, total = fit_unigram_vocab(ds)
    assert mega not in vocab and total == 4  # a=2, b=2
    out = {r["doc_id"]: r for r in unigram_logprob(ds).take_all()}
    assert out[0]["n_tokens"] == 2  # mega token not scored either

    vocab_exact, total_exact = fit_unigram_vocab(ds, max_token_chars=None)
    assert mega in vocab_exact and total_exact == 5


def test_ppl_buckets_quantile_assignment(ray_session):
    """Exact quantile_disc thresholds (rank ceil(q*n)-1) split head /
    middle / tail; ties on the threshold value land in the lower bucket."""
    import ray

    from fuzi_rd.functions.lm_score import ppl_buckets, unigram_logprob

    # 8 docs with a spread of surprisal: repeated common tokens vs rare ones
    texts = [
        "a a a a", "a a a b", "a a b b", "a b b c",
        "b c c d", "c d d e", "d e e f", "e f g h",
    ]
    ds = _docs_ds(ray, texts)
    scores = {
        r["doc_id"]: r["mean_surprisal_milli"]
        for r in unigram_logprob(ds, top_k=None, max_token_chars=None).take_all()
    }
    out = {r["doc_id"]: r for r in
           ppl_buckets(ds, top_k=None, max_token_chars=None).take_all()}
    # recompute thresholds by the quantile_disc definition
    import math

    vals = sorted(scores.values())
    n = len(vals)
    t1 = vals[max(0, math.ceil(0.25 * n) - 1)]
    t2 = vals[max(0, math.ceil(0.75 * n) - 1)]
    for did, s in scores.items():
        want = "head" if s <= t1 else ("middle" if s <= t2 else "tail")
        assert out[did]["bucket"] == want, (did, s, t1, t2)
        assert out[did]["mean_surprisal_milli"] == s
    assert {r["bucket"] for r in out.values()} == {"head", "middle", "tail"}


def test_ppl_buckets_empty_corpus(ray_session):
    """All-zero-token corpora produce an empty result with the full
    3-column schema (no histogram to bucket)."""
    import ray

    from fuzi_rd.functions.lm_score import ppl_buckets

    out = ppl_buckets(_docs_ds(ray, ["", "   "])).take_all()
    assert out == []


def test_bigram_logprob_matches_hand_computation(ray_session):
    import ray

    from fuzi_rd.functions.lm_score import bigram_logprob

    texts = ["a b a b", "b a", "c"]
    # uni: a=3, b=3, c=1 -> V=3; bigrams: ab=2, ba=2 (doc0 'b a' + doc1)
    out = bigram_logprob(_docs_ds(ray, texts)).take_all()
    by_id = {r["doc_id"]: r for r in out}

    def milli(cb, cu):
        return math.floor(-1000 * math.log(float(cb + 1) / float(cu + 3)))

    ab, ba = milli(2, 3), milli(2, 3)
    assert by_id[0]["n_bigrams"] == 3
    assert by_id[0]["bigram_surprisal_milli"] == ab + ba + ab
    assert by_id[0]["mean_bigram_surprisal_milli"] == (2 * ab + ba) // 3
    assert by_id[1]["bigram_surprisal_milli"] == ba
    assert 2 not in by_id  # single-token doc: no transition to score


def test_bigram_scores_word_order(ray_session):
    """The signal unigram can't see: a token-permuted doc shares the
    unigram distribution but has unseen transitions, so it scores
    strictly higher under the bigram model."""
    import ray

    from fuzi_rd.functions.lm_score import bigram_logprob, unigram_logprob

    natural = "the cat sat on the mat"
    corpus = [natural] * 9 + ["mat the on sat cat the"]
    out = {
        r["doc_id"]: r["mean_bigram_surprisal_milli"]
        for r in bigram_logprob(_docs_ds(ray, corpus)).take_all()
    }
    assert out[9] > out[0]
    uni = {
        r["doc_id"]: r["mean_surprisal_milli"]
        for r in unigram_logprob(_docs_ds(ray, corpus)).take_all()
    }
    assert uni[9] == uni[0]  # unigram is order-blind


def test_bigram_top_k_cap_bounds_broadcast(ray_session):
    """Capped fits stay bounded and score every doc; V stays the exact
    distinct-token count even when the vocab broadcast is capped."""
    import ray

    from fuzi_rd.functions.lm_score import bigram_logprob, fit_bigram_counts

    texts = [f"t{i} t{(i + 1) % 40} common common" for i in range(40)]
    bigrams = fit_bigram_counts(_docs_ds(ray, texts), top_k=5)
    assert len(bigrams) == 5
    out = bigram_logprob(_docs_ds(ray, texts), top_k=5).take_all()
    assert len(out) == 40
    assert all(r["n_bigrams"] == 3 for r in out)


def test_dsir_weights_separate_target_from_raw(ray_session):
    """Docs drawn from the target vocabulary score strictly higher than
    off-target docs; empty docs are excluded."""
    import ray

    from fuzi_rd.functions.lm_score import dsir_weights

    target_texts = ["the quick brown fox jumps"] * 5
    junk_texts = ["zzz qqq vvv kkk jjj"] * 5
    texts = target_texts + junk_texts + [""]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    target = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(target_texts, pa.string()),
            }
        )
    )
    out = {r["doc_id"]: r for r in dsir_weights(ds, target).take_all()}
    assert 10 not in out  # empty doc has no features
    assert out[0]["dsir_milli"] > out[5]["dsir_milli"]
    assert out[0]["n_features"] == 9  # 5 unigrams + 4 bigrams


def test_dsir_buckets_match_duckdb_md5_number_lower(ray_session):
    """The feature hash follows DuckDB md5_number_lower % B exactly."""
    import duckdb

    from fuzi_rd.functions.lm_score import _dsir_feature_buckets

    toks = ["alpha", "beta", "gamma"]
    got = _dsir_feature_buckets(toks, 8192)
    want = []
    for t in toks:
        want.append(
            duckdb.sql(
                f"SELECT CAST(md5_number_lower('{t}') % 8192 AS BIGINT)"
            ).fetchone()[0]
        )
    for a, b in zip(toks, toks[1:]):
        want.append(
            duckdb.sql(
                "SELECT CAST(md5_number_lower('"
                + a
                + "' || chr(1) || '"
                + b
                + "') % 8192 AS BIGINT)"
            ).fetchone()[0]
        )
    assert got == want
