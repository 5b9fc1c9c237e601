"""r7 operators: bloom membership sketch, unigram-LM Jensen-Shannon
divergence, nested sample ladder."""

import math

import pytest
from pyspark.sql import functions as F

from earthmover_spark.operators import sketch
from earthmover_spark.util import EarthmoverSparkError


# ---------------------------------------------------------------------------
# bloom_sketch / bloom_merge / bloom_probe
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded(spark):
    keys = spark.createDataFrame(
        [(f"user{i}",) for i in range(200)], ["k"]
    )
    bf = sketch.bloom_sketch(keys, "k", num_bits=4096, num_hashes=4)
    rows = bf.collect()
    # bounded: at most num_bits rows, all in [0, num_bits)
    assert len(rows) <= 4096
    assert all(0 <= r.bit < 4096 for r in rows)
    # every inserted key probes as member (no false negatives, ever)
    got = {
        r.k: r.member
        for r in sketch.bloom_probe(
            bf, keys, "k", num_bits=4096, num_hashes=4
        ).collect()
    }
    assert all(got[f"user{i}"] for i in range(200))


def test_bloom_absent_keys_mostly_reject(spark):
    seen = spark.createDataFrame([(f"in{i}",) for i in range(100)], ["k"])
    bf = sketch.bloom_sketch(seen, "k", num_bits=8192, num_hashes=4)
    probe = spark.createDataFrame([(f"out{i}",) for i in range(100)], ["k"])
    got = sketch.bloom_probe(bf, probe, "k", num_bits=8192, num_hashes=4)
    members = [r.k for r in got.collect() if r.member]
    # fp rate at n=100, m=8192, k=4 is ~2e-6; even 5 hits would be
    # astronomically unlikely
    assert len(members) <= 5


def test_bloom_merge_equals_union_build(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], ["k"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], ["k"])
    merged = sketch.bloom_merge(
        sketch.bloom_sketch(a, "k", 2048, 3).union(
            sketch.bloom_sketch(b, "k", 2048, 3)
        )
    )
    direct = sketch.bloom_sketch(a.union(b), "k", 2048, 3)
    assert {r.bit for r in merged.collect()} == {
        r.bit for r in direct.collect()
    }


def test_bloom_null_keys_excluded_and_validation(spark):
    df = spark.createDataFrame([("x",), (None,)], "k string")
    bf = sketch.bloom_sketch(df, "k", num_bits=64, num_hashes=2)
    assert bf.count() <= 2  # only "x" contributes bits
    with pytest.raises(ValueError, match="num_bits"):
        sketch.bloom_sketch(df, "k", num_bits=0)
    with pytest.raises(ValueError, match="num_bits"):
        sketch.bloom_probe(bf, df, "k", num_hashes=0)


# ---------------------------------------------------------------------------
# lm_divergence
# ---------------------------------------------------------------------------


def test_lm_divergence_identical_zero_and_symmetric(spark):
    from earthmover_spark.llm import textstats

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "a dog ran far away")],
        ["doc_id", "text"],
    )
    other = spark.createDataFrame(
        [(1, "completely different words entirely"), (2, "more new tokens")],
        ["doc_id", "text"],
    )
    same = textstats.lm_divergence(docs, docs).collect()[0]
    assert same.jsd == 0.0
    assert same.n_tokens_a == same.n_tokens_b == 11
    ab = textstats.lm_divergence(docs, other).collect()[0]
    ba = textstats.lm_divergence(other, docs).collect()[0]
    assert ab.jsd == ba.jsd  # JSD is symmetric
    assert 0.0 < ab.jsd < math.log(2) + 1e-9
    # disjoint vocabularies push toward ln 2 once the smoothing mass
    # is small relative to the counts (default 0.5 per term swamps
    # these tiny corpora — by design it tempers small-sample drift)
    light = textstats.lm_divergence(docs, other, smoothing=0.01).collect()[0]
    assert light.jsd > 0.6


def test_lm_divergence_hand_computed(spark):
    from earthmover_spark.llm import textstats

    a = spark.createDataFrame([(1, "x x y")], ["doc_id", "text"])
    b = spark.createDataFrame([(1, "x y y")], ["doc_id", "text"])
    s = 0.5
    # union vocab {x, y}: p = (2+.5)/(3+1), (1+.5)/(3+1); q mirrored
    p = [2.5 / 4, 1.5 / 4]
    q = [1.5 / 4, 2.5 / 4]
    exp = 0.0
    for pi, qi in zip(p, q):
        m = (pi + qi) / 2
        exp += 0.5 * (pi * math.log(pi / m) + qi * math.log(qi / m))
    got = textstats.lm_divergence(a, b, smoothing=s).collect()[0]
    assert abs(got.jsd - exp) < 1e-6
    assert got.vocab_size == 2
    # per-term contributions sum to the scalar jsd
    terms = textstats.lm_divergence(a, b, smoothing=s, per_term=True).collect()
    assert abs(sum(t.contrib for t in terms) - exp) < 1e-6
    assert {t.term for t in terms} == {"x", "y"}
    with pytest.raises(ValueError, match="smoothing"):
        textstats.lm_divergence(a, b, smoothing=0)


# ---------------------------------------------------------------------------
# sample_ladder
# ---------------------------------------------------------------------------


def test_sample_ladder_nests_and_matches_deterministic_sample(spark):
    from earthmover_spark.llm import sampling

    df = spark.createDataFrame([(i,) for i in range(5000)], ["k"])
    out = sampling.sample_ladder(
        df, "k", fractions=[0.01, 0.1, 0.5], salt="s"
    )
    rungs = {r.k: r.rung for r in out.collect()}
    sets = [
        {k for k, rg in rungs.items() if rg is not None and rg <= i}
        for i in range(3)
    ]
    # strict nesting
    assert sets[0] <= sets[1] <= sets[2]
    # each rung-prefix IS the deterministic sample at that fraction
    # (same salt scheme)
    for i, frac in enumerate([0.01, 0.1, 0.5]):
        det = {
            r.k
            for r in sampling.deterministic_sample(
                df, "k", frac, salt="s"
            ).collect()
        }
        assert sets[i] == det
    # sizes roughly proportional
    assert 10 <= len(sets[0]) <= 120
    assert 350 <= len(sets[1]) <= 650
    assert 2200 <= len(sets[2]) <= 2800


def test_sample_ladder_validation(spark):
    from earthmover_spark.llm import sampling

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(EarthmoverSparkError, match="non-empty"):
        sampling.sample_ladder(df, "k", fractions=[])
    with pytest.raises(EarthmoverSparkError, match="increasing"):
        sampling.sample_ladder(df, "k", fractions=[0.1, 0.1])
    with pytest.raises(EarthmoverSparkError, match="increasing"):
        sampling.sample_ladder(df, "k", fractions=[0.5, 0.1])
    with pytest.raises(EarthmoverSparkError, match="fraction"):
        sampling.sample_ladder(df, "k", fractions=[0.0, 0.5])


def test_sample_ladder_zero_shuffle_plan(spark):
    from earthmover_spark.llm import sampling

    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    plan = (
        sampling.sample_ladder(df, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# canonicalize_urls
# ---------------------------------------------------------------------------


def test_canonicalize_urls(spark):
    from earthmover_spark.operators import url as U

    rows = [
        # tracking params dropped, survivors sorted, fragment gone
        (1, "HTTPS://Example.COM:443/a/?utm_source=x&b=2&a=1#frag"),
        # same logical URL, different param order / no tracking
        (2, "https://example.com/a?a=1&b=2"),
        # non-default port kept; trailing slash stripped
        (3, "http://example.com:8080/path/"),
        # unparseable -> NULL
        (4, "not a url"),
        # bare host, no path/query
        (5, "http://EXAMPLE.com"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {r.id: r.url_canonical for r in U.canonicalize_urls(df).collect()}
    assert got[1] == "https://example.com/a?a=1&b=2"
    assert got[2] == "https://example.com/a?a=1&b=2"  # canonical MATCH
    assert got[3] == "http://example.com:8080/path"
    assert got[4] is None
    assert got[5] == "http://example.com"
    import pytest as _pytest

    with _pytest.raises(Exception, match="no column"):
        U.canonicalize_urls(df, url_col="zzz")


def test_canonicalize_urls_tracking_params_tunable(spark):
    """`ref` is content-significant (e.g. ?ref=<branch> on code
    hosts) so the DEFAULT set keeps it; callers can opt in to
    stripping it per corpus."""
    from earthmover_spark.operators import url as U

    rows = [
        (1, "https://host.com/repo?ref=main"),
        (2, "https://host.com/p?spm=a.b&x=1"),
        (3, "https://host.com/p?utm_medium=email&x=1"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    dflt = {r.id: r.url_canonical for r in U.canonicalize_urls(df).collect()}
    assert dflt[1] == "https://host.com/repo?ref=main"  # ref KEPT
    assert dflt[2] == "https://host.com/p?spm=a.b&x=1"  # spm KEPT
    assert dflt[3] == "https://host.com/p?x=1"  # utm_* stripped
    custom = {
        r.id: r.url_canonical
        for r in U.canonicalize_urls(
            df,
            tracking_params=(*U.DEFAULT_TRACKING_PARAMS, "ref", "spm"),
        ).collect()
    }
    assert custom[1] == "https://host.com/repo"
    assert custom[2] == "https://host.com/p?x=1"


# ---------------------------------------------------------------------------
# c4_line_filter
# ---------------------------------------------------------------------------


def test_c4_line_filter(spark):
    from earthmover_spark.llm import curation

    text = (
        "This is a good prose sentence.\n"
        "short line\n"
        "Enable javascript to view this page.\n"
        "Another fine sentence ends here!\n"
        "menu\n"
        'He said "stop".'
    )
    df = spark.createDataFrame([(1, text), (2, "")], ["doc_id", "text"])
    got = {r.doc_id: r for r in curation.c4_line_filter(df).collect()}
    kept = got[1].text.split("\n")
    assert kept == [
        "This is a good prose sentence.",
        "Another fine sentence ends here!",
        'He said "stop".',
    ]
    assert (got[1].n_lines_kept, got[1].n_lines_dropped) == (3, 3)
    assert got[2].text == "" and got[2].n_lines_kept == 0
    # punctuation requirement off: word count still gates
    loose = {
        r.doc_id: r.n_lines_kept
        for r in curation.c4_line_filter(
            df, require_terminal_punct=False, drop_patterns=()
        ).collect()
    }
    assert loose[1] == 4  # only "short line" (2 words) and "menu" drop
    import pytest as _pytest

    with _pytest.raises(Exception, match="min_words"):
        curation.c4_line_filter(df, min_words=0)


def test_c4_line_filter_crlf_and_tabs(spark):
    # Windows \r\n endings and tab padding must not defeat the
    # word-count or terminal-punctuation checks
    from earthmover_spark.llm import curation

    text = "One good windows line here.\r\n\tTabbed but still fine!\r\nno\r\n"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = curation.c4_line_filter(df).collect()[0]
    assert got.text.split("\n") == [
        "One good windows line here.",
        "Tabbed but still fine!",
    ]
    assert got.n_lines_kept == 2


def test_c4_line_filter_zero_shuffle_plan(spark):
    from earthmover_spark.llm import curation

    df = spark.createDataFrame([(1, "a b c.")], ["doc_id", "text"])
    plan = (
        curation.c4_line_filter(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# kmv_sketch / kmv_jaccard
# ---------------------------------------------------------------------------


def test_kmv_sketch_bounded_and_deterministic(spark):
    df = spark.createDataFrame(
        [(f"v{i % 300}",) for i in range(3000)], ["x"]
    )
    sk = sketch.kmv_sketch(df, "x", k=64)
    rows = [r.h for r in sk.collect()]
    assert len(rows) == 64  # 300 distinct > k -> exactly k
    assert rows == sorted(rows) or sorted(rows) == sorted(rows)
    # partitioning-invariant
    rows2 = sorted(r.h for r in sketch.kmv_sketch(df.repartition(7), "x", k=64).collect())
    assert sorted(rows) == rows2
    # small distinct set -> whole set, not padded
    tiny = sketch.kmv_sketch(
        spark.createDataFrame([("a",), ("b",), ("a",), (None,)], "x string"),
        "x", k=64,
    )
    assert tiny.count() == 2


def test_kmv_jaccard_tracks_exact(spark):
    # two overlapping integer sets with known Jaccard 1/3:
    # A = 0..1999, B = 1000..2999 -> |A&B|=1000, |A|B|=3000
    a = spark.createDataFrame([(i,) for i in range(2000)], ["x"])
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], ["x"])
    est = sketch.kmv_jaccard(
        sketch.kmv_sketch(a, "x", k=512),
        sketch.kmv_sketch(b, "x", k=512),
        k=512,
    ).collect()[0]
    assert est.k_used == 512
    # ~1/sqrt(512) ~ 4.4% error envelope; allow 4 sigma
    assert abs(est.jaccard_est - 1 / 3) < 0.09
    # identical sets -> exactly 1; disjoint -> exactly 0
    same = sketch.kmv_jaccard(
        sketch.kmv_sketch(a, "x", k=256), sketch.kmv_sketch(a, "x", k=256),
        k=256,
    ).collect()[0]
    assert same.jaccard_est == 1.0
    c = spark.createDataFrame([(i,) for i in range(10_000, 12_000)], ["x"])
    disj = sketch.kmv_jaccard(
        sketch.kmv_sketch(a, "x", k=256), sketch.kmv_sketch(c, "x", k=256),
        k=256,
    ).collect()[0]
    assert disj.jaccard_est == 0.0 and disj.n_both == 0


def test_kmv_merge_via_union_matches_direct(spark):
    import pytest as _pytest

    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], ["x"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], ["x"])
    k = 128
    # merging = sketch the union of the two sketch frames' hashes:
    # keep the k smallest of the combined frames
    merged = sketch.kmv_merge(
        sketch.kmv_sketch(a, "x", k=k).union(sketch.kmv_sketch(b, "x", k=k)),
        k=k,
    )
    direct = sketch.kmv_sketch(a.union(b), "x", k=k)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )
    with _pytest.raises(ValueError, match="k must"):
        sketch.kmv_sketch(a, "x", k=0)
    with _pytest.raises(ValueError, match="k must"):
        sketch.kmv_jaccard(merged, direct, k=0)


# ---------------------------------------------------------------------------
# gopher_quality_filter
# ---------------------------------------------------------------------------


def test_gopher_quality_filter_rules(spark):
    from earthmover_spark.llm import curation

    good = (
        "The quick brown fox jumps over the lazy dog and keeps running "
        "through the field with great determination that never fades. "
    ) * 5  # ~110 words of prose with stopwords
    rows = [
        (1, good),
        (2, "too short to pass."),  # < min_words
        (3, " ".join(["#"] * 80)),  # symbols, no alpha, no stopwords
        (4, "\n".join(["- bullet item one two three."] * 10)
            + "\nThe end of the list is here with that sentence."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in curation.gopher_quality_filter(df).collect()}
    assert got[1].gopher_pass is True
    assert got[1].stopword_hits >= 2
    assert 3.0 <= got[1].mean_word_len <= 10.0
    assert got[2].gopher_pass is False  # word count
    g3 = got[3]
    assert g3.gopher_pass is False
    assert g3.alpha_word_frac == 0.0 and g3.symbol_word_ratio >= 1.0
    # doc 4: 10/11 bullet lines > 0.9 cap
    g4 = got[4]
    assert g4.bullet_line_frac > 0.9 and g4.gopher_pass is False
    assert got[5].gopher_pass is False and got[5].n_words == 0


def test_gopher_filter_thresholds_configurable(spark):
    from earthmover_spark.llm import curation

    df = spark.createDataFrame(
        [(1, "The small cat and the dog have fun with that toy.")],
        ["doc_id", "text"],
    )
    strict = curation.gopher_quality_filter(df).collect()[0]
    assert strict.gopher_pass is False  # 11 words < default 50
    loose = curation.gopher_quality_filter(df, min_words=5).collect()[0]
    assert loose.gopher_pass is True


def test_gopher_filter_zero_shuffle_plan(spark):
    from earthmover_spark.llm import curation

    df = spark.createDataFrame([(1, "a b c.")], ["doc_id", "text"])
    plan = (
        curation.gopher_quality_filter(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# line_repetition_stats
# ---------------------------------------------------------------------------


def test_line_repetition_stats(spark):
    from earthmover_spark.llm import curation

    text = (
        "unique line one\n"
        "repeated line\n"
        "repeated line\n"
        "repeated line\n"
        "\n"
        "para one here\n\n"
        "para one here"
    )
    # lines: [unique line one, repeated line x3, para one here x2] = 6
    # lines, 3 distinct -> dup_line_frac = 3/6
    # paras (blank-line split): [block1(4 lines), para one here,
    # para one here] = 3 paras, 2 distinct -> dup_para_frac = 1/3
    df = spark.createDataFrame([(1, text), (2, ""), (3, "solo line")],
                               ["doc_id", "text"])
    got = {r.doc_id: r for r in
           curation.line_repetition_stats(df).collect()}
    g = got[1]
    assert g.n_lines == 6 and g.dup_line_frac == 0.5
    # dup chars: "repeated line"(13) x 2 extra + "para one here"(13) x 1
    total = len("unique line one") + 13 * 3 + 13 * 2
    assert g.dup_line_char_frac == round((13 * 2 + 13) / total, 6)
    assert g.n_paras == 3 and g.dup_para_frac == round(1 / 3, 6)
    # empty and single-line docs
    assert got[2].n_lines == 0 and got[2].dup_line_frac is None
    assert got[3].dup_line_frac == 0.0 and got[3].n_paras == 1


def test_line_repetition_stats_zero_shuffle(spark):
    from earthmover_spark.llm import curation

    df = spark.createDataFrame([(1, "a\nb")], ["doc_id", "text"])
    plan = (
        curation.line_repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# paragraph_dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_removes_boilerplate(spark):
    from earthmover_spark.llm import curation

    cookie = "We use cookies on this site."
    rows = [
        (1, f"{cookie}\n\nUnique body of doc one.\n\nAnother para one."),
        (2, f"{cookie}\n\nDifferent body for doc two."),
        (3, f"{cookie}\n\nThird document text here."),
        (4, "No boilerplate at all in this one."),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in curation.paragraph_dedup(df).collect()}
    # the cookie banner (3 docs > max_docs=1) is stripped everywhere
    assert got[1].text == "Unique body of doc one.\n\nAnother para one."
    assert got[1].n_paras_kept == 2 and got[1].n_paras_dropped == 1
    assert got[2].text == "Different body for doc two."
    assert got[3].text == "Third document text here."
    # untouched docs pass through whole
    assert got[4].text == "No boilerplate at all in this one."
    assert got[4].n_paras_dropped == 0
    assert got[5].text == "" and got[5].n_paras_kept == 0
    # max_docs=3 tolerates the banner (appears in exactly 3 docs)
    loose = {
        r.doc_id: r.n_paras_dropped
        for r in curation.paragraph_dedup(df, max_docs=3).collect()
    }
    assert all(v == 0 for v in loose.values())
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_docs"):
        curation.paragraph_dedup(df, max_docs=0)


def test_paragraph_dedup_preserves_order_and_duplicate_paras(spark):
    from earthmover_spark.llm import curation

    # a WITHIN-doc duplicate paragraph is not boilerplate (1 distinct
    # doc) and both copies survive, in order
    df = spark.createDataFrame(
        [(1, "Alpha.\n\nBeta.\n\nAlpha.\n\nGamma.")], ["doc_id", "text"]
    )
    got = curation.paragraph_dedup(df).collect()[0]
    assert got.text == "Alpha.\n\nBeta.\n\nAlpha.\n\nGamma."
    assert got.n_paras_kept == 4


# ---------------------------------------------------------------------------
# render_chat
# ---------------------------------------------------------------------------


def test_render_chat_chatml_and_spans(spark):
    from earthmover_spark.llm.chat import render_chat

    rows = [
        (1, [("system", "Be helpful."), ("user", "Hi"),
             ("assistant", "Hello!"), ("user", "Bye"),
             ("assistant", "See ya")]),
        (2, []),
        (3, None),
        (4, [("assistant", None), (None, "orphan")]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, messages array<struct<role:string,content:string>>",
    )
    out = {r.doc_id: r for r in render_chat(df).collect()}
    r1 = out[1]
    assert r1.text == (
        "<|im_start|>system\nBe helpful.<|im_end|>\n"
        "<|im_start|>user\nHi<|im_end|>\n"
        "<|im_start|>assistant\nHello!<|im_end|>\n"
        "<|im_start|>user\nBye<|im_end|>\n"
        "<|im_start|>assistant\nSee ya<|im_end|>\n"
    )
    # the spans slice back to exactly the assistant contents
    assert [r1.text[s.start:s.end] for s in r1.assistant_spans] == [
        "Hello!", "See ya",
    ]
    assert r1.n_turns == 5 and r1.n_mask_chars == 12
    assert out[2].text == "" and out[2].assistant_spans == []
    assert out[3].text == "" and out[3].n_turns == 0
    # NULL role/content render as empty but keep their turn
    r4 = out[4]
    assert [r4.text[s.start:s.end] for s in r4.assistant_spans] == [""]
    assert r4.n_turns == 2


def test_render_chat_simple_template_and_mask_role(spark):
    import pytest as _pytest

    from earthmover_spark.llm.chat import render_chat

    df = spark.createDataFrame(
        [(1, [("user", "q"), ("assistant", "a")])],
        "doc_id bigint, messages array<struct<role:string,content:string>>",
    )
    r = render_chat(df, template="simple", mask_role="user").collect()[0]
    assert r.text == "user: q\nassistant: a\n"
    assert [r.text[s.start:s.end] for s in r.assistant_spans] == ["q"]
    with _pytest.raises(Exception, match="unknown template"):
        render_chat(df, template="nope").collect()


def test_render_chat_zero_shuffle(spark):
    from earthmover_spark.llm.chat import render_chat

    df = spark.createDataFrame(
        [(1, [("user", "q")])],
        "doc_id bigint, messages array<struct<role:string,content:string>>",
    )
    plan = (
        render_chat(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# quantile_sketch / quantile_merge / quantile_estimate
# ---------------------------------------------------------------------------


def test_quantile_sketch_matches_python_reference(spark):
    import hashlib

    rows = [(i, float((i * 37) % 1000)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["id", "val"])
    est = {
        r.prob: r.quantile_est
        for r in sketch.quantile_estimate(
            sketch.quantile_sketch(df, "val", "id", k=256),
            probs=[0.25, 0.5, 0.9],
        ).collect()
    }

    def h60(s):
        return int(
            hashlib.md5(f"qsk:{s}".encode()).hexdigest()[:15], 16
        )

    sample = sorted(
        (v for _, v in sorted(rows, key=lambda r: (h60(r[0]), r[1]))[:256])
    )
    for p in (0.25, 0.5, 0.9):
        rank = max(1, math.ceil(p * len(sample)))
        assert est[p] == sample[rank - 1]


def test_quantile_sketch_partition_invariant_and_bounded(spark):
    rows = [(i, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "val"])
    a = sorted(
        (r.h, r.v)
        for r in sketch.quantile_sketch(df, "val", "id", k=64).collect()
    )
    b = sorted(
        (r.h, r.v)
        for r in sketch.quantile_sketch(
            df.repartition(13), "val", "id", k=64
        ).collect()
    )
    assert a == b and len(a) == 64


def test_quantile_merge_lossless_for_disjoint_rows(spark):
    rows = [(i, float((i * 13) % 97)) for i in range(1000)]
    h1 = spark.createDataFrame(rows[:500], ["id", "val"])
    h2 = spark.createDataFrame(rows[500:], ["id", "val"])
    full = spark.createDataFrame(rows, ["id", "val"])
    merged = sketch.quantile_merge(
        sketch.quantile_sketch(h1, "val", "id", k=128).union(
            sketch.quantile_sketch(h2, "val", "id", k=128)
        ),
        k=128,
    )
    direct = sketch.quantile_sketch(full, "val", "id", k=128)
    assert sorted((r.h, r.v) for r in merged.collect()) == sorted(
        (r.h, r.v) for r in direct.collect()
    )


def test_quantile_sketch_grouped_and_estimate_accuracy(spark):
    # uniform 0..999 per group: sampled median should land near 500
    rows = [(g * 100000 + i, float(i % 1000), g) for g in range(3) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "val", "g"])
    sk = sketch.quantile_sketch(df, "val", "id", k=256, group_cols=["g"])
    counts = {r.g: r["count"] for r in sk.groupBy("g").count().collect()}
    assert counts == {0: 256, 1: 256, 2: 256}
    med = {
        r.g: r.quantile_est
        for r in sketch.quantile_estimate(
            sk, probs=[0.5], group_cols=["g"]
        ).collect()
    }
    for g in range(3):
        assert abs(med[g] - 500.0) < 100  # ~1/sqrt(256) error band


def test_quantile_sketch_validation_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (None, 3.0)], ["id", "val"]
    )
    with pytest.raises(ValueError):
        sketch.quantile_sketch(df, "val", "id", k=0)
    with pytest.raises(ValueError):
        sketch.quantile_estimate(df.limit(0), probs=[1.5])
    # NULL value and NULL id rows are excluded
    assert sketch.quantile_sketch(df, "val", "id", k=10).count() == 1
