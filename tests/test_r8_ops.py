"""Round-8 operators: DSIR importance weighting/resampling and CCNet
perplexity tiers (llm/selection.py).

The DSIR weights are property-checked against a plain-Python
implementation of Xie et al. 2023's hashed-ngram importance ratio
(same md5 bucket hash, same add-smoothing), and the sampler against a
plain-Python Gumbel-top-k with the same md5 uniforms.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _py_norm(text):
    import re

    t = (text or "").lower()
    t = re.sub(r"[^\w\s]", "", t, flags=re.UNICODE)
    return re.sub(r"\s+", " ", t).strip()


def _py_feats(text, ngram=2):
    arr = _py_norm(text).split(" ")
    feats = list(arr)
    for n in range(2, ngram + 1):
        if len(arr) >= n:
            feats += [
                " ".join(arr[i : i + n]) for i in range(len(arr) - n + 1)
            ]
    return feats


def _py_bucket(g, buckets, salt="dsir"):
    h = int(hashlib.md5(f"{salt}:{g}".encode()).hexdigest()[:15], 16)
    return h % buckets


def _py_dsir(raw_rows, target_rows, buckets=64, ngram=2, a=1.0):
    """raw_rows/target_rows: list of (doc_id, text)."""
    r_cnt, t_cnt = {}, {}
    for _, text in raw_rows:
        for g in _py_feats(text, ngram):
            b = _py_bucket(g, buckets)
            r_cnt[b] = r_cnt.get(b, 0) + 1
    for _, text in target_rows:
        for g in _py_feats(text, ngram):
            b = _py_bucket(g, buckets)
            t_cnt[b] = t_cnt.get(b, 0) + 1
    r_tot, t_tot = sum(r_cnt.values()), sum(t_cnt.values())
    out = {}
    for doc_id, text in raw_rows:
        lw, n = 0.0, 0
        for g in _py_feats(text, ngram):
            b = _py_bucket(g, buckets)
            lw += (
                math.log(t_cnt.get(b, 0) + a)
                - math.log(t_tot + a * buckets)
                - math.log(r_cnt.get(b, 0) + a)
                + math.log(r_tot + a * buckets)
            )
            n += 1
        out[doc_id] = (n, round(lw, 6))
    return out


_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick onyx goblin jumps over the lazy dwarf"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "the five boxing wizards jump quickly"),
    (6, "how vexingly quick daft zebras jump"),
    (7, "the quick brown fox"),
    (8, ""),
]


def test_dsir_weights_match_python_reference(spark):
    from earthmover_spark.llm.selection import dsir_weights

    raw = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    target = raw.filter(F.col("doc_id") % 2 == 1)
    got = {
        r.doc_id: (r.n_feats, r.dsir_logweight)
        for r in dsir_weights(raw, target, buckets=64, ngram=2).collect()
    }
    want = _py_dsir(_DOCS, [d for d in _DOCS if d[0] % 2 == 1], buckets=64)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-5), k


def test_dsir_weights_pull_toward_target(spark):
    """Docs sharing the target's vocabulary must outscore docs that
    don't: target = fox/dog sentences, so doc 7 (pure target vocab)
    beats doc 4 (disjoint vocab)."""
    from earthmover_spark.llm.selection import dsir_weights

    raw = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    target = raw.filter(F.col("doc_id").isin(1, 3, 7))
    w = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(raw, target, buckets=4096, ngram=2).collect()
    }
    assert w[7] > w[4]
    assert w[1] > w[2]


def test_dsir_sample_matches_python_gumbel_topk(spark):
    from earthmover_spark.llm.selection import dsir_sample, dsir_weights

    raw = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    target = raw.filter(F.col("doc_id") % 2 == 1)
    w = dsir_weights(raw, target, buckets=64, ngram=2)
    got = [r.doc_id for r in dsir_sample(w, 3).collect()]
    weights = _py_dsir(_DOCS, [d for d in _DOCS if d[0] % 2 == 1], buckets=64)

    def key(doc_id):
        u = (
            int(
                hashlib.md5(f"dsirsmp:{doc_id}".encode()).hexdigest()[:15],
                16,
            )
            + 1.0
        ) / float(1 << 60)
        return weights[doc_id][1] - math.log(-math.log(u))

    want = sorted(weights, key=lambda d: (-key(d), d))[:3]
    assert got == want


def test_dsir_validation(spark):
    from earthmover_spark.llm.selection import (
        dsir_sample,
        dsir_weights,
        perplexity_buckets,
    )
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    with pytest.raises(EarthmoverSparkError, match="buckets"):
        dsir_weights(df, df, buckets=1)
    with pytest.raises(EarthmoverSparkError, match="ngram"):
        dsir_weights(df, df, ngram=0)
    with pytest.raises(EarthmoverSparkError, match="smoothing"):
        dsir_weights(df, df, smoothing=0)
    with pytest.raises(EarthmoverSparkError, match="n must"):
        dsir_sample(df.withColumn("dsir_logweight", F.lit(0.0)), 0)
    with pytest.raises(EarthmoverSparkError, match="temperature"):
        dsir_sample(df.withColumn("dsir_logweight", F.lit(0.0)), 1,
                    temperature=0)
    with pytest.raises(EarthmoverSparkError, match="tiers"):
        perplexity_buckets(df, "x", tiers=())


def test_perplexity_buckets_deterministic_tiers(spark):
    from earthmover_spark.llm.selection import perplexity_buckets

    rows = [(i, "g%d" % (i % 2), float(100 - i)) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    out = perplexity_buckets(
        df, "score", group_cols=["lang"]
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.lang, []).append((r.score, r.tier))
    for g, vals in by_group.items():
        vals.sort(reverse=True)  # higher score first
        tiers = [t for _, t in vals]
        assert tiers == ["head"] * 2 + ["middle"] * 2 + ["tail"] * 2
    # temperature parameter of dsir_sample shifts toward uniform but
    # keeps determinism: same call twice gives identical output
    out2 = perplexity_buckets(df, "score", group_cols=["lang"]).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_perplexity_buckets_custom_tiers(spark):
    from earthmover_spark.llm.selection import perplexity_buckets

    rows = [(i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "score"])
    out = perplexity_buckets(df, "score", tiers=("keep", "drop")).collect()
    kept = {r.doc_id for r in out if r.tier == "keep"}
    # top half by score
    assert kept == {5, 6, 7, 8, 9}


# ---------------------------------------------------------------------------
# resolve_duplicates_by_score (keep the best copy)
# ---------------------------------------------------------------------------


def test_resolve_duplicates_by_score_keeps_argmax(spark):
    from earthmover_spark.llm.curation import (
        resolve_duplicates,
        resolve_duplicates_by_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "short", 5.0),
            (2, "much longer better copy", 23.0),
            (3, "mid copy", 8.0),
            (4, "unpaired", 8.0),
            (5, None, None),  # NULL score ranks last
        ],
        ["doc_id", "text", "quality"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 5)], ["id_a", "id_b"]
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_keeper)
        for r in resolve_duplicates_by_score(docs, pairs, "quality").collect()
    }
    # cluster label stays the min id (1), keeper is the max-quality doc
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3] == (1, False)
    assert out[5] == (1, False)
    assert out[4] == (4, True)  # unpaired keeps itself
    # min-id policy would have kept doc 1 instead
    base = {
        r.doc_id: r.is_keeper
        for r in resolve_duplicates(docs, pairs).collect()
    }
    assert base[1] and not base[2]


def test_resolve_duplicates_by_score_tiebreak_min_id(spark):
    from earthmover_spark.llm.curation import resolve_duplicates_by_score

    docs = spark.createDataFrame(
        [(7, 1.0), (9, 1.0)], ["doc_id", "quality"]
    )
    pairs = spark.createDataFrame([(7, 9)], ["id_a", "id_b"])
    out = {
        r.doc_id: r.is_keeper
        for r in resolve_duplicates_by_score(docs, pairs, "quality").collect()
    }
    assert out[7] and not out[9]


# ---------------------------------------------------------------------------
# Luhn-validated card redaction
# ---------------------------------------------------------------------------


def test_redact_pii_validate_cards(spark):
    from earthmover_spark.llm.curation import redact_pii

    rows = [
        (1, "pay with 4242 4242 4242 4242 now"),  # Luhn-valid
        (2, "order 1234 5678 9012 3456 shipped"),  # Luhn-invalid
        (3, "card 4111-1111-1111-1111 and phone +1 555 123 4567"),
        (4, "no digits here"),
        (5, "valid 79927398713 but 11 digits is too short for a card"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r.id: r for r in redact_pii(df, validate_cards=True).collect()}
    assert got[1].text == "pay with <CARD> now" and got[1].n_cards == 1
    # invalid checksum: NOT a card; the digit run falls through to the
    # phone redactor
    assert got[2].n_cards == 0 and got[2].text == "order <PHONE> shipped"
    assert got[3].text == "card <CARD> and phone <PHONE>"
    assert got[4].text == "no digits here" and got[4].n_cards == 0
    assert got[5].n_cards == 0  # too short for the card shape
    # without the flag, column absent and cards degrade to phone runs
    base = {r.id: r for r in redact_pii(df).collect()}
    assert "n_cards" not in base[1].asDict()
    assert base[1].text == "pay with <PHONE> now"


def test_redact_pii_card_repeated_occurrences_counted(spark):
    from earthmover_spark.llm.curation import redact_pii

    df = spark.createDataFrame(
        [(1, "a 4242 4242 4242 4242 b 4242 4242 4242 4242 c")],
        ["id", "text"],
    )
    r = redact_pii(df, validate_cards=True).collect()[0]
    assert r.n_cards == 2
    assert r.text == "a <CARD> b <CARD> c"


# ---------------------------------------------------------------------------
# fill-in-the-middle + length bucketing
# ---------------------------------------------------------------------------


def test_fim_transform_reconstructs_original(spark):
    """PSM pieces must reassemble to the original text: prefix +
    middle + suffix == doc, for every transformed row."""
    import re

    from earthmover_spark.llm.chat import fim_transform

    docs = spark.createDataFrame(
        [(i, "abcdefghijklmnopqrstuvwxyz"[: 1 + i % 26]) for i in range(60)],
        ["doc_id", "text"],
    )
    orig = {r.doc_id: r.text for r in docs.collect()}
    out = fim_transform(docs, fim_rate=0.7).collect()
    n_applied = 0
    for r in out:
        if not r.fim_applied:
            assert r.text == orig[r.doc_id]
            continue
        n_applied += 1
        m = re.fullmatch(r"<PRE>(.*)<SUF>(.*)<MID>(.*)", r.text, re.S)
        assert m, r.text
        pre, suf, mid = m.groups()
        assert pre + mid + suf == orig[r.doc_id], r.doc_id
    # rate 0.7 over 60 docs: applied count is in a sane band
    assert 25 <= n_applied <= 55


def test_fim_transform_deterministic_and_rate_bounds(spark):
    from earthmover_spark.llm.chat import fim_transform
    from earthmover_spark.util import EarthmoverSparkError

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], ["doc_id", "text"]
    )
    a = sorted(map(tuple, fim_transform(docs, fim_rate=1.0).collect()))
    b = sorted(map(tuple, fim_transform(docs, fim_rate=1.0).collect()))
    assert a == b
    got = {r.doc_id: r for r in fim_transform(docs, fim_rate=1.0).collect()}
    assert got[2].fim_applied is False  # empty text never transforms
    assert got[2].text == ""
    none = fim_transform(docs, fim_rate=0.0).collect()
    assert all(not r.fim_applied for r in none)
    with pytest.raises(EarthmoverSparkError, match="fim_rate"):
        fim_transform(docs, fim_rate=1.5)


def test_length_buckets_bounded_spread_and_batches(spark):
    from earthmover_spark.llm.chat import length_buckets
    from earthmover_spark.util import EarthmoverSparkError

    rows = [(i, 3 + (i * 7) % 200) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = length_buckets(df, "n_tok", batch_size=8).collect()
    by_batch = {}
    for r in out:
        assert r.bucket <= r.n_tok < 2 * r.bucket  # power-of-2 band
        by_batch.setdefault((r.bucket, r.batch_id), []).append(r.n_tok)
    for (bucket, _), lens in by_batch.items():
        assert len(lens) <= 8
        assert max(lens) < 2 * min(lens)  # padding waste bounded
    with pytest.raises(EarthmoverSparkError, match="batch_size"):
        length_buckets(df, "n_tok", batch_size=0)


# ---------------------------------------------------------------------------
# clean_text (ftfy-lite unicode cleanup)
# ---------------------------------------------------------------------------


def test_clean_text_folds_and_collapses(spark):
    from earthmover_spark.llm.curation import clean_text

    rows = [
        (1, "“Smart” ‘quotes’ — and… stuff"),
        (2, "a b​c   d\t\te"),
        (3, "line1   \n\n\n\n\nline2\r\nline3\x07bell"),
        (4, "  already clean  "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r.id: r for r in clean_text(df).collect()}
    assert got[1].text == "\"Smart\" 'quotes' - and... stuff"
    assert got[2].text == "a bc d e"
    assert got[3].text == "line1\n\nline2\nline3bell"
    assert got[4].text == "already clean" and got[4].n_chars_cleaned == 4
    assert got[5].text == "" and got[5].n_chars_cleaned == 0
    # idempotent: cleaning clean text changes nothing
    again = {r.id: r for r in clean_text(clean_text(df)).collect()}
    assert all(again[i].text == got[i].text for i in got)


def test_script_stats_fractions(spark):
    from earthmover_spark.llm.textstats import script_stats

    rows = [
        (1, "hello world"),
        (2, "Привет мир"),
        (3, "你好世界 hello"),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r.id: r
        for r in script_stats(
            df, scripts=["latin", "cyrillic", "han"]
        ).collect()
    }
    assert got[1].frac_latin == 1.0 and got[1].n_nonspace == 10
    assert got[2].frac_cyrillic == 1.0
    assert got[3].frac_han == pytest.approx(4 / 9, abs=1e-6)
    assert got[3].frac_latin == pytest.approx(5 / 9, abs=1e-6)
    assert got[4].n_nonspace == 0 and got[4].frac_latin == 0.0
    with pytest.raises(ValueError, match="unknown scripts"):
        script_stats(df, scripts=["klingon"])


def test_unigram_logprob_ref_oov_penalty(spark):
    """Tokens absent from the reference LM get the floor probability
    smoothing/(total + smoothing*vocab): a doc of pure OOV words must
    score exactly that floor, and in-vocab docs must beat OOV docs."""
    import math

    from earthmover_spark.llm.textstats import unigram_logprob_ref

    ref = spark.createDataFrame(
        [(100, "alpha beta gamma alpha")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "zzz qqq")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r
        for r in unigram_logprob_ref(
            docs, ref, vocab_size=1000, smoothing=1.0
        ).collect()
    }
    floor = math.log(1.0 / (4 + 1000.0))
    assert got[2].avg_logprob == pytest.approx(floor, abs=1e-6)
    assert got[1].avg_logprob > got[2].avg_logprob
    # alpha: ln(3/1004), beta: ln(2/1004), averaged
    want1 = (math.log(3 / 1004.0) + math.log(2 / 1004.0)) / 2
    assert got[1].avg_logprob == pytest.approx(want1, abs=1e-6)
    with pytest.raises(Exception, match="vocab_size"):
        unigram_logprob_ref(docs, ref, vocab_size=0)


def test_flag_outliers_robust_resists_masking(spark):
    """The classic z-score is masked by the outlier inflating the
    stddev; the median/MAD screen flags it."""
    from earthmover_spark.operators.groupby import (
        flag_outliers,
        flag_outliers_robust,
    )

    rows = [("a", float(v)) for v in [1, 2, 3, 2, 1, 2, 3, 2, 1000]]
    df = spark.createDataFrame(rows, ["g", "v"])
    robust = {
        r.v: r.is_outlier
        for r in flag_outliers_robust(df, "v", ["g"], z=3.5).collect()
    }
    assert robust[1000.0] is True
    assert all(not flagged for v, flagged in robust.items() if v != 1000.0)
    classic = {
        r.v: r.is_outlier
        for r in flag_outliers(df, "v", ["g"], z=3.0).collect()
    }
    assert classic[1000.0] is False  # masked: 1000 is within 3 sigma
    # zero-MAD group: all scores 0, nothing flagged
    const = spark.createDataFrame(
        [("b", 5.0)] * 4, ["g", "v"]
    )
    out = flag_outliers_robust(const, "v", ["g"]).collect()
    assert all(r.robust_z == 0.0 and not r.is_outlier for r in out)


def test_flag_outliers_robust_approx_path(spark):
    """exact=False (t-digest medians, bounded agg state) flags the
    same obvious outlier; scores differ at most by the approx error."""
    from earthmover_spark.operators.groupby import flag_outliers_robust

    rows = [("a", float(v % 50)) for v in range(2000)] + [("a", 1e6)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.v: r.is_outlier
           for r in flag_outliers_robust(df, "v", ["g"],
                                         exact=False).collect()}
    assert out[1e6] is True
    assert sum(out.values()) == 1


# ---------------------------------------------------------------------------
# global_index + negative_samples
# ---------------------------------------------------------------------------


def test_global_index_dense_and_boundary_stable(spark):
    """The index must be a dense 0..n-1 permutation matching the sort
    order — across MULTIPLE range partitions (regression: the
    range-exchange samples boundaries per job, and unpinned shuffles
    misaligned the prefix offsets for 97% of rows)."""
    from earthmover_spark.operators.groupby import global_index

    rows = [((i * 131) % 10000,) for i in range(10000)]
    df = spark.createDataFrame(rows, ["k"])
    out = sorted(
        global_index(df, ["k"], partitions=16).collect(),
        key=lambda r: r.k,
    )
    assert [r.idx for r in out] == list(range(10000))


def test_negative_samples_contract(spark):
    from earthmover_spark.llm.sampling import negative_samples
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    out = negative_samples(df, k=3).collect()
    assert len(out) == 150
    assert all(r.neg_id != r.doc_id for r in out)
    assert {(r.doc_id, r.j) for r in out} == {
        (i, j) for i in range(50) for j in (1, 2, 3)
    }
    # deterministic
    out2 = negative_samples(df, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # degenerate corpora
    assert negative_samples(
        spark.createDataFrame([(1,)], ["doc_id"]), k=2
    ).count() == 0
    two = negative_samples(
        spark.createDataFrame([(1,), (2,)], ["doc_id"]), k=2
    ).collect()
    assert all(
        {r.doc_id, r.neg_id} == {1, 2} for r in two
    )  # only possible negative is the other row
    with pytest.raises(EarthmoverSparkError, match="k must"):
        negative_samples(df, k=0)
