"""r8 late-wave operators: association rules, readability, PMI
collocations — each checked against a plain-Python reference."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from earthmover_spark.operators import assoc
from earthmover_spark.llm import textstats
from earthmover_spark.util import EarthmoverSparkError


# ---------------------------------------------------------------------------
# association_rules
# ---------------------------------------------------------------------------

BASKETS = [
    (1, "milk"), (1, "bread"), (1, "eggs"),
    (2, "milk"), (2, "bread"),
    (3, "milk"), (3, "bread"), (3, "beer"),
    (4, "beer"), (4, "eggs"),
    (5, "milk"), (5, "eggs"), (5, "eggs"),  # dup item in basket
]


def _ref_rules(rows, min_count):
    bi = sorted(set(rows))
    baskets = {b for b, _ in bi}
    n = len(baskets)
    ic = Counter(i for _, i in bi)
    by_basket = {}
    for b, i in bi:
        by_basket.setdefault(b, []).append(i)
    pc = Counter()
    for items in by_basket.values():
        items = sorted(items)
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                pc[(items[x], items[y])] += 1
    out = {}
    for (a, b), c in pc.items():
        if c < min_count:
            continue
        out[(a, b)] = {
            "pair_count": c,
            "count_a": ic[a],
            "count_b": ic[b],
            "support": round(c / n, 6),
            "conf_a_b": round(c / ic[a], 6),
            "conf_b_a": round(c / ic[b], 6),
            "lift": round(c * n / (ic[a] * ic[b]), 6),
        }
    return out


def test_assoc_rules_matches_reference(spark):
    df = spark.createDataFrame(BASKETS, ["basket", "item"])
    got = {
        (r.item_a, r.item_b): r.asDict()
        for r in assoc.association_rules(
            df, "basket", "item", min_count=2, top_k=None
        ).collect()
    }
    want = _ref_rules(BASKETS, 2)
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for f, v in w.items():
            assert g[f] == pytest.approx(v, abs=1e-9), (k, f)
    # milk+bread co-occur in 3 of 5 baskets
    mb = got[("bread", "milk")]
    assert mb["pair_count"] == 3
    assert mb["support"] == pytest.approx(0.6)
    # lift > 1: bread never appears without milk
    assert mb["lift"] == pytest.approx(3 * 5 / (3 * 4))


def test_assoc_rules_dup_rows_collapse_and_ordering(spark):
    df = spark.createDataFrame(BASKETS, ["basket", "item"])
    rows = assoc.association_rules(
        df, "basket", "item", min_count=1, top_k=3
    ).collect()
    assert len(rows) == 3
    # ranked by pair_count desc first
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # basket 5's duplicate eggs row counts once
    full = {
        (r.item_a, r.item_b): r.pair_count
        for r in assoc.association_rules(
            df, "basket", "item", min_count=1, top_k=None
        ).collect()
    }
    assert full[("eggs", "milk")] == 2  # baskets 1 and 5


def test_assoc_rules_max_basket_guard(spark):
    mega = [(99, f"i{j}") for j in range(50)]
    df = spark.createDataFrame(BASKETS + mega, ["basket", "item"])
    got = assoc.association_rules(
        df, "basket", "item", min_count=1,
        max_basket_size=10, top_k=None,
    ).collect()
    # no pair from the 50-item basket survives
    assert not any(
        r.item_a.startswith("i") and r.item_b.startswith("i") for r in got
    )
    # the guarded basket also leaves item/basket totals
    want = _ref_rules(BASKETS, 1)
    assert {(r.item_a, r.item_b) for r in got} == set(want)
    sup = {(r.item_a, r.item_b): r.support for r in got}
    assert sup[("bread", "milk")] == pytest.approx(0.6)


def test_assoc_rules_validation(spark):
    df = spark.createDataFrame(BASKETS, ["basket", "item"])
    with pytest.raises(ValueError, match="min_count"):
        assoc.association_rules(df, "basket", "item", min_count=0)


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------

def _ref_readability(text):
    words = len(re.findall(r"[A-Za-z]+", text))
    sents = max(len(re.findall(r"[.!?]+", text)), 1)
    syll = len(re.findall(r"[aeiouyAEIOUY]+", text))
    w = max(words, 1)
    wps = w / sents
    spw = syll / w
    return {
        "n_words": words,
        "n_sentences": sents,
        "n_syllables": syll,
        "flesch_ease": round(206.835 - 1.015 * wps - 84.6 * spw, 6),
        "fk_grade": round(0.39 * wps + 11.8 * spw - 15.59, 6),
    }


TEXTS = [
    "The cat sat on the mat. It was happy!",
    "Incomprehensibilities notwithstanding, administrative "
    "bureaucratization perpetuates organizational inefficiencies.",
    "",
    "no punctuation here at all",
    "Ellipsis... and?! mixed?? terminators. done",
]


def test_readability_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    got = {r.doc_id: r.asDict() for r in textstats.readability(df).collect()}
    for i, t in enumerate(TEXTS):
        want = _ref_readability(t)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-9), (i, k)
    # simple prose scores much easier than bureaucratese
    assert got[0]["flesch_ease"] > got[1]["flesch_ease"] + 50
    assert got[0]["fk_grade"] < got[1]["fk_grade"]
    # empty text: floors keep the formulas finite
    assert got[2]["n_words"] == 0 and got[2]["n_sentences"] == 1


def test_readability_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = textstats.readability(df).collect()[0]
    assert r.n_words == 0 and r.n_syllables == 0 and r.n_sentences == 1


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------

def _norm(t):
    t = re.sub(r"[^\w\s]", "", t.lower())
    return re.sub(r"\s+", " ", t).strip()


def _ref_pmi(texts, min_count):
    uni, big = Counter(), Counter()
    for t in texts:
        toks = [w for w in _norm(t).split(" ") if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    out = {}
    for (a, b), c in big.items():
        if c < min_count:
            continue
        pmi = math.log((c / n2) / ((uni[a] / n1) * (uni[b] / n1)))
        out[(a, b)] = (c, round(pmi, 6))
    return out


PMI_TEXTS = [
    "new york is a big city",
    "i love new york and new york loves me",
    "the city of new york",
    "big data and big models",
    "a lone word",
    "solo",
    "",
]


def test_pmi_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PMI_TEXTS)], ["doc_id", "text"]
    )
    got = {
        (r.w1, r.w2): (r.pair_count, r.pmi)
        for r in textstats.pmi_collocations(
            df, min_count=2, top_k=None
        ).collect()
    }
    want = _ref_pmi(PMI_TEXTS, 2)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6), k
    # "new york" is the canonical collocation of this corpus
    assert ("new", "york") in got
    assert got[("new", "york")][0] == 4
    top = textstats.pmi_collocations(df, min_count=2, top_k=1).collect()
    assert (top[0].w1, top[0].w2) == max(
        want, key=lambda k: (want[k][1], )
    ) or top[0].pmi == pytest.approx(
        max(v[1] for v in want.values()), abs=1e-6
    )


def test_pmi_single_word_docs_contribute_no_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "solo"), (3, "solo run"), (4, "solo run")],
        ["doc_id", "text"],
    )
    got = {
        (r.w1, r.w2): r.pair_count
        for r in textstats.pmi_collocations(
            df, min_count=1, top_k=None
        ).collect()
    }
    assert got == {("solo", "run"): 2}


def test_pmi_validation(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(EarthmoverSparkError, match="min_count"):
        textstats.pmi_collocations(df, min_count=0)


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def _ref_lpa(edge_list, iters):
    und = {
        tuple(sorted(e)) for e in edge_list
        if e[0] != e[1] and None not in e
    }
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n, ns in nbrs.items():
            cnt = {}
            for m in ns:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    return labels


def test_label_prop_two_cliques(spark):
    from earthmover_spark.operators import graph

    # two triangles bridged by one edge: LPA converges to one label
    # per triangle, the bridge does not merge them in 2 rounds
    edges = [
        (1, 2), (2, 3), (1, 3),
        (10, 11), (11, 12), (10, 12),
        (3, 10),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for iters in (1, 2, 3):
        got = {
            r.node: r.community
            for r in graph.label_propagation(df, iters=iters).collect()
        }
        assert got == _ref_lpa(edges, iters), iters
    got2 = {
        r.node: r.community
        for r in graph.label_propagation(df, iters=2).collect()
    }
    assert got2[1] == got2[2] == got2[3] == 1
    assert got2[11] == got2[12]


def test_label_prop_hygiene_and_validation(spark):
    from earthmover_spark.operators import graph
    from earthmover_spark.util import EarthmoverSparkError

    # self-loops, duplicate and reversed edges, NULLs all collapse
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (2, 2), (1, 2), (None, 3), (3, None)],
        "src long, dst long",
    )
    got = {
        r.node: r.community
        for r in graph.label_propagation(edges, iters=2).collect()
    }
    assert got == {1: 1, 2: 2}  # one edge: each adopts the other, twice
    with pytest.raises(EarthmoverSparkError, match="iters"):
        graph.label_propagation(edges, iters=0)


def test_label_prop_star_converges_to_hub_minimum(spark):
    from earthmover_spark.operators import graph

    # star: hub 5, leaves 6..9. Round 1: leaves adopt 5; hub adopts
    # min leaf 6. Round 2: leaves adopt 6 (hub's label), hub adopts 5.
    edges = spark.createDataFrame(
        [(5, x) for x in (6, 7, 8, 9)], ["src", "dst"]
    )
    want = _ref_lpa([(5, x) for x in (6, 7, 8, 9)], 2)
    got = {
        r.node: r.community
        for r in graph.label_propagation(edges, iters=2).collect()
    }
    assert got == want
    assert got[5] == 5 and all(got[x] == 6 for x in (6, 7, 8, 9))


# ---------------------------------------------------------------------------
# bloom_filtered_join
# ---------------------------------------------------------------------------

def test_bloom_join_equals_plain_join(spark):
    from earthmover_spark.operators import dataframe as df_ops

    left = spark.createDataFrame(
        [(i, f"v{i}") for i in range(500)], ["k", "payload"]
    )
    right = spark.createDataFrame(
        [(i * 7, i) for i in range(30)], ["k", "dim"]
    )
    got = df_ops.bloom_filtered_join(
        left, right, "k", num_bits=1 << 12, num_hashes=3
    )
    want = left.join(right, "k", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # left_semi flavor
    got_semi = df_ops.bloom_filtered_join(
        left, right, "k", how="left_semi", num_bits=1 << 12, num_hashes=3
    )
    want_semi = left.join(right, "k", "left_semi")
    assert sorted(map(tuple, got_semi.collect())) == sorted(
        map(tuple, want_semi.collect())
    )


def test_bloom_join_null_keys_and_validation(spark):
    from earthmover_spark.operators import dataframe as df_ops
    from earthmover_spark.util import EarthmoverSparkError

    left = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, payload string"
    )
    right = spark.createDataFrame([(1, "x"), (None, "y")], "k long, d string")
    got = df_ops.bloom_filtered_join(left, right, "k").collect()
    # NULL keys never match (standard equi-join semantics)
    assert [(r.k, r.payload, r.d) for r in got] == [(1, "a", "x")]
    with pytest.raises(EarthmoverSparkError, match="how"):
        df_ops.bloom_filtered_join(left, right, "k", how="left")
    with pytest.raises(EarthmoverSparkError, match="num_bits"):
        df_ops.bloom_filtered_join(left, right, "k", num_bits=0)


def test_bloom_join_tiny_filter_still_exact(spark):
    from earthmover_spark.operators import dataframe as df_ops

    # 16 bits -> false positives everywhere; the join must still be
    # exact because the real join removes them
    left = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    right = spark.createDataFrame([(5,), (100,), (199,)], ["k"])
    got = df_ops.bloom_filtered_join(
        left, right, "k", num_bits=16, num_hashes=2
    )
    assert sorted(r.k for r in got.collect()) == [5, 100, 199]


# ---------------------------------------------------------------------------
# random_project (Johnson-Lindenstrauss)
# ---------------------------------------------------------------------------

def test_jl_matches_numpy_reference(spark):
    import numpy as np
    from earthmover_spark.llm.embeddings import jl_signs, random_project

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: list(r.proj)
        for r in random_project(df, k=4, dims=16).collect()
    }
    R = np.array(jl_signs(16, 4), dtype="float64")
    want = vecs.astype("float64") @ R / np.sqrt(4)
    for i in range(20):
        assert got[i] == pytest.approx(list(want[i]), abs=1e-6), i


def test_jl_preserves_distances_statistically(spark):
    import numpy as np
    from earthmover_spark.llm.embeddings import random_project

    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    proj = np.array(
        [
            r.proj
            for r in random_project(df, k=32, dims=64)
            .orderBy("vec_id")
            .collect()
        ]
    )
    # JL lemma: pairwise squared distances preserved within modest
    # distortion at k=32 for most pairs; check the median ratio is
    # near 1 (a wrong scale factor or sign matrix would blow this up)
    d_hi = ((vecs[:30] - vecs[30:]) ** 2).sum(axis=1)
    d_lo = ((proj[:30] - proj[30:]) ** 2).sum(axis=1)
    ratio = np.median(d_lo / d_hi)
    assert 0.7 < ratio < 1.3


def test_jl_determinism_and_seed(spark):
    from earthmover_spark.llm.embeddings import random_project

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    a = random_project(df, k=2, dims=4).collect()[0].proj
    b = random_project(df, k=2, dims=4).collect()[0].proj
    assert a == b
    c = random_project(df, k=2, dims=4, seed="other").collect()[0].proj
    assert a != c  # a different seed draws a different matrix


def test_jl_validation(spark):
    from earthmover_spark.llm.embeddings import random_project

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k <= dims"):
        random_project(df, k=3, dims=2)
    with pytest.raises(ValueError, match="empty"):
        random_project(df.limit(0), k=1)


# ---------------------------------------------------------------------------
# file_stats
# ---------------------------------------------------------------------------

def test_file_stats_per_file_manifest(spark, tmp_path):
    from earthmover_spark.operators import profile

    src = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") % 7).alias("v"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("string"))
        .alias("s"),
    )
    path = str(tmp_path / "multi")
    src.repartition(3).write.parquet(path)
    df = spark.read.parquet(path)
    rows = profile.file_stats(df, ["id", "s"]).collect()
    assert len(rows) == 3  # one manifest row per part file
    assert all(r.file.startswith("part-") for r in rows)
    assert sum(r.n_rows for r in rows) == 300
    assert sum(r.nulls_s for r in rows) == 30
    # global min/max are the extremes of the per-file zone maps
    assert min(r.min_id for r in rows) == 0
    assert max(r.max_id for r in rows) == 299
    # per-file consistency against the actual file contents
    for r in rows:
        part = spark.read.parquet(f"{path}/{r.file}")
        assert part.count() == r.n_rows
        lo, hi = part.agg(F.min("id"), F.max("id")).first()
        assert (lo, hi) == (r.min_id, r.max_id)


def test_file_stats_validation(spark, tmp_path):
    from earthmover_spark.operators import profile
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.range(3)
    with pytest.raises(EarthmoverSparkError, match="non-empty"):
        profile.file_stats(df, [])
    with pytest.raises(EarthmoverSparkError, match="not in frame"):
        profile.file_stats(df, ["nope"])


# ---------------------------------------------------------------------------
# infer_types
# ---------------------------------------------------------------------------

def test_infer_types_all_rules(spark):
    from earthmover_spark.operators import column as col_ops

    df = spark.createDataFrame(
        [
            ("1", "1.5", "true", "2024-01-02", "2024-01-02 10:20:30", "x", ""),
            ("-42", "2", "FALSE", "1999-12-31", "2024-01-02T10:20:30.5", "y", ""),
            ("", "-1e3", "True", "", "", "z", ""),
        ],
        "i string, f string, b string, d string, ts string, s string, e string",
    )
    out = col_ops.infer_types(df)
    types = dict(out.dtypes)
    assert types == {
        "i": "bigint",
        "f": "double",
        "b": "boolean",
        "d": "date",
        "ts": "timestamp",
        "s": "string",   # unparseable stays string
        "e": "string",   # entirely missing: no evidence
    }
    rows = out.collect()
    assert rows[0].i == 1 and rows[1].i == -42 and rows[2].i is None
    assert rows[2].f == -1000.0
    assert rows[0].b is True and rows[1].b is False
    assert str(rows[1].d) == "1999-12-31" and rows[2].d is None
    assert rows[1].ts.microsecond == 500000
    assert rows[2].ts is None


def test_infer_types_mixed_stays_string_and_int_beats_double(spark):
    from earthmover_spark.operators import column as col_ops

    df = spark.createDataFrame(
        [("1", "1"), ("2.5", "2"), ("oops", "3")], "a string, n string"
    )
    out = col_ops.infer_types(df)
    types = dict(out.dtypes)
    assert types["a"] == "string"  # "oops" vetoes double
    assert types["n"] == "bigint"  # pure ints promote to bigint, not double
    # 0/1 columns are ints, NOT booleans (priority is deliberate)
    df01 = spark.createDataFrame([("0",), ("1",)], "z string")
    assert dict(col_ops.infer_types(df01).dtypes)["z"] == "bigint"


def test_infer_types_scoping_and_validation(spark):
    from earthmover_spark.operators import column as col_ops
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame([(1, "2")], "k long, v string")
    # non-string columns pass through untouched; scoping works
    out = col_ops.infer_types(df)
    assert dict(out.dtypes) == {"k": "bigint", "v": "bigint"}
    kept = col_ops.infer_types(df, columns=["k"])  # k isn't string: no-op
    assert dict(kept.dtypes) == {"k": "bigint", "v": "string"}
    with pytest.raises(EarthmoverSparkError, match="not in frame"):
        col_ops.infer_types(df, columns=["zz"])
