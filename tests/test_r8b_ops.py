"""r8 late-wave operators: association rules, readability, PMI
collocations — each checked against a plain-Python reference."""

import math
import re
from collections import Counter

import pytest

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
