"""Preference-data ops (llm/preference.py): best_of_n,
preference_pairs, win_counts, bradley_terry, fleiss_kappa,
cohens_kappa_pairs — pure-Python reference parity plus the
determinism / NULL-hygiene / guard cases the r10 self-reviews keep
finding."""

import math

import pytest

from earthmover_spark.util import EarthmoverSparkError

COMPLETIONS = [
    # (prompt_id, doc_id, score)
    (1, 10, 0.9),
    (1, 11, 0.2),
    (1, 12, 0.9),   # tie with 10 on top — smaller id wins
    (1, 13, None),  # NULL never wins
    (2, 20, 0.5),   # singleton group: no pair
    (3, 30, 0.4),
    (3, 31, 0.4),   # all-equal group: margin 0 -> no pair
    (4, 40, 0.8),
    (4, 41, 0.1),
    (4, 42, 0.5),
]
CSCHEMA = "prompt_id long, doc_id long, score double"


# ---------------------------------------------------------------------------
# best_of_n
# ---------------------------------------------------------------------------


def test_best_of_n_determinism_and_null(spark):
    from earthmover_spark.llm.preference import best_of_n

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    top1 = best_of_n(df, "prompt_id", "score", n=1, tiebreak_col="doc_id")
    got = {(r.prompt_id, r.doc_id) for r in top1.collect()}
    # prompt 1: 10 and 12 tie at 0.9 -> smaller doc_id (10); 13's NULL
    # score never wins even though NULLS FIRST would sort it on top
    assert got == {(1, 10), (2, 20), (3, 30), (4, 40)}

    top2 = best_of_n(df, "prompt_id", "score", n=2, tiebreak_col="doc_id")
    rows = {(r.prompt_id, r.doc_id, r.rank) for r in top2.collect()}
    assert (1, 10, 1) in rows and (1, 12, 2) in rows
    assert (4, 40, 1) in rows and (4, 42, 2) in rows
    with pytest.raises(EarthmoverSparkError):
        best_of_n(df, "prompt_id", "score", n=0)


def test_best_of_n_window_group_limit_plan(spark):
    from earthmover_spark.llm.preference import best_of_n

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    plan = (
        best_of_n(df, "prompt_id", "score", n=2, tiebreak_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------


def test_preference_pairs_extreme(spark):
    from earthmover_spark.llm.preference import preference_pairs

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    out = preference_pairs(df, "prompt_id", "doc_id", "score").collect()
    by_prompt = {r.prompt_id: r for r in out}
    # prompt 1: chosen = min-id of the 0.9 tie (10), rejected = 11
    assert set(by_prompt) == {1, 4}  # 2 singleton, 3 zero-margin
    assert (by_prompt[1].chosen_id, by_prompt[1].rejected_id) == (10, 11)
    assert by_prompt[1].margin == pytest.approx(0.7)
    assert (by_prompt[4].chosen_id, by_prompt[4].rejected_id) == (40, 41)


def test_preference_pairs_margin_and_text(spark):
    from earthmover_spark.llm.preference import preference_pairs

    rows = [(1, 10, 0.9, "good"), (1, 11, 0.6, "meh"), (1, 12, 0.1, "bad")]
    df = spark.createDataFrame(
        rows, "prompt_id long, doc_id long, score double, text string"
    )
    out = preference_pairs(
        df, "prompt_id", "doc_id", "score", text_col="text", min_margin=0.9
    ).collect()
    assert out == []  # max margin is 0.8
    out = preference_pairs(
        df, "prompt_id", "doc_id", "score", text_col="text", min_margin=0.5
    ).collect()
    assert len(out) == 1
    assert (out[0].chosen_text, out[0].rejected_text) == ("good", "bad")


def test_preference_pairs_all_mode_and_guard(spark):
    from earthmover_spark.llm.preference import preference_pairs

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    out = preference_pairs(
        df, "prompt_id", "doc_id", "score", mode="all"
    ).collect()
    got = {(r.prompt_id, r.chosen_id, r.rejected_id) for r in out}
    # prompt 1: 10>11, 12>11 (10 vs 12 margin 0 -> dropped);
    # prompt 4: 40>41, 40>42, 42>41
    assert got == {
        (1, 10, 11),
        (1, 12, 11),
        (4, 40, 41),
        (4, 40, 42),
        (4, 42, 41),
    }
    # the oversize guard is a lazy assert column riding the all-pairs
    # shuffle (no eager pre-scan), so it raises at ACTION time
    with pytest.raises(Exception, match="max_group_size"):
        preference_pairs(
            df, "prompt_id", "doc_id", "score", mode="all", max_group_size=2
        ).collect()
    with pytest.raises(EarthmoverSparkError, match="mode"):
        preference_pairs(df, "prompt_id", "doc_id", "score", mode="bogus")


# ---------------------------------------------------------------------------
# win_counts / bradley_terry
# ---------------------------------------------------------------------------

BATTLES = [
    ("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"),
    ("a", "c"), ("a", "c"), ("c", "a"),
    ("b", "c"), ("c", "b"), ("b", "c"),
    ("a", "d"), ("d", "b"),
]


def _bt_reference(battles, iters, smoothing):
    """Independent pure-Python MM replica of bradley_terry."""
    wins, games = {}, {}
    items = set()
    for w, l in battles:
        items.update((w, l))
        wins[w] = wins.get(w, 0) + 1
        k = (min(w, l), max(w, l))
        games[k] = games.get(k, 0) + 1
    p = {i: 1.0 for i in items}
    for _ in range(iters):
        denom = {i: 2.0 * smoothing / (p[i] + 1.0) for i in items}
        for (a, b), n in games.items():
            d = n / (p[a] + p[b])
            denom[a] += d
            denom[b] += d
        p = {i: (wins.get(i, 0) + smoothing) / denom[i] for i in items}
        lg = sum(math.log(v) for v in p.values()) / len(p)
        p = {i: v / math.exp(lg) for i, v in p.items()}
    return p


def test_win_counts(spark):
    from earthmover_spark.llm.preference import win_counts

    df = spark.createDataFrame(BATTLES, "winner string, loser string")
    got = {(r.winner, r.loser): r.n_wins for r in win_counts(df).collect()}
    assert got[("a", "b")] == 3 and got[("b", "a")] == 1
    assert got[("d", "b")] == 1
    # the self-battle guard is a lazy assert column on the aggregated
    # frame (no extra validation scan), so it raises at ACTION time
    with pytest.raises(Exception, match="winner == loser"):
        win_counts(
            spark.createDataFrame([("a", "a")], "winner string, loser string")
        ).collect()


def test_bradley_terry_matches_python_mm(spark):
    from earthmover_spark.llm.preference import bradley_terry

    df = spark.createDataFrame(BATTLES, "winner string, loser string")
    out = bradley_terry(df, iters=8, smoothing=0.5)
    got = {r.item: r for r in out.collect()}
    ref = _bt_reference(BATTLES, iters=8, smoothing=0.5)
    assert set(got) == set(ref)
    for i, pv in ref.items():
        assert got[i].strength == pytest.approx(pv, rel=1e-9)
    # a dominates, d is 1-1 against mid-pack; counts faithful
    assert got["a"].n_wins == 6 and got["a"].n_losses == 2
    assert got["d"].n_games == 2
    assert got["a"].strength > got["b"].strength > 0
    # scale pin: geometric mean == 1
    logs = sum(math.log(r.strength) for r in got.values())
    assert logs == pytest.approx(0.0, abs=1e-9)


def test_bradley_terry_winless_item_finite(spark):
    from earthmover_spark.llm.preference import bradley_terry

    # c never wins; smoothing keeps it finite and strictly positive
    df = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("a", "b"), ("b", "a")],
        "winner string, loser string",
    )
    got = {r.item: r.strength for r in bradley_terry(df, iters=12).collect()}
    assert 0 < got["c"] < got["a"]
    assert all(math.isfinite(v) for v in got.values())


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------


def _fleiss_reference(rows):
    """Independent Fleiss 1971 computation (variable n_i)."""
    from collections import Counter, defaultdict

    per_item = defaultdict(Counter)
    for item, label in rows:
        per_item[item][label] += 1
    kept = {i: c for i, c in per_item.items() if sum(c.values()) >= 2}
    p_is = []
    cat = Counter()
    for c in kept.values():
        n = sum(c.values())
        p_is.append((sum(v * v for v in c.values()) - n) / (n * (n - 1)))
        cat.update(c)
    tot = sum(cat.values())
    p_bar = sum(p_is) / len(p_is)
    p_e = sum((v / tot) ** 2 for v in cat.values())
    return (p_bar - p_e) / (1 - p_e), p_bar, p_e


def test_fleiss_kappa_matches_python(spark):
    from earthmover_spark.llm.preference import fleiss_kappa

    rows = [
        (1, "pos"), (1, "pos"), (1, "neg"),
        (2, "pos"), (2, "pos"), (2, "pos"),
        (3, "neg"), (3, "neg"), (3, "neu"),
        (4, "pos"), (4, "neg"), (4, "neu"),
        (5, "neu"),            # n_i = 1 -> excluded
        (6, None), (None, "pos"),  # NULL hygiene
    ]
    df = spark.createDataFrame(rows, "item_id long, label string")
    out = fleiss_kappa(df).collect()[0]
    valid = [(i, l) for i, l in rows if i is not None and l is not None]
    k, p_bar, p_e = _fleiss_reference(valid)
    assert out.kappa == pytest.approx(k, rel=1e-12)
    assert out.p_bar == pytest.approx(p_bar, rel=1e-12)
    assert out.p_e == pytest.approx(p_e, rel=1e-12)
    assert out.n_items == 4 and out.n_items_excluded == 1
    assert out.n_ratings == 12


def test_fleiss_kappa_perfect_and_degenerate(spark):
    from earthmover_spark.llm.preference import fleiss_kappa

    # single observed category: p_e == 1 -> kappa NULL, not 1.0
    one = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "x")], "item_id long, label string"
    )
    row = fleiss_kappa(one).collect()[0]
    assert row.kappa is None and row.p_bar == 1.0
    # perfect two-category agreement: kappa == 1
    two = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (2, "y")], "item_id long, label string"
    )
    assert fleiss_kappa(two).collect()[0].kappa == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# cohens_kappa_pairs
# ---------------------------------------------------------------------------


def _cohen_reference(pairs):
    """kappa from (label_a, label_b) pairs — independent formula."""
    from collections import Counter

    n = len(pairs)
    po = sum(1 for a, b in pairs if a == b) / n
    ca, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    pe = sum(ca[l] * cb.get(l, 0) for l in ca) / (n * n)
    return (po - pe) / (1 - pe)


def test_cohens_kappa_pairs_matches_python(spark):
    from earthmover_spark.llm.preference import cohens_kappa_pairs

    rows = [
        # rater r1/r2 overlap on items 1-5; r3 rates 1-2 only
        (1, "r1", "pos"), (1, "r2", "pos"), (1, "r3", "neg"),
        (2, "r1", "neg"), (2, "r2", "pos"), (2, "r3", "neg"),
        (3, "r1", "pos"), (3, "r2", "pos"),
        (4, "r1", "neg"), (4, "r2", "neg"),
        (5, "r1", "pos"), (5, "r2", "neg"),
    ]
    df = spark.createDataFrame(rows, "item_id long, rater_id string, label string")
    out = {(r.rater_a, r.rater_b): r for r in cohens_kappa_pairs(df).collect()}
    assert set(out) == {("r1", "r2"), ("r1", "r3"), ("r2", "r3")}
    r12 = out[("r1", "r2")]
    assert r12.n_items == 5
    pairs12 = [("pos", "pos"), ("neg", "pos"), ("pos", "pos"),
               ("neg", "neg"), ("pos", "neg")]
    assert r12.kappa == pytest.approx(_cohen_reference(pairs12), rel=1e-12)
    # r1 vs r3: labels (pos,neg),(neg,neg) -> po=0.5
    assert out[("r1", "r3")].p_o == pytest.approx(0.5)


def test_cohens_kappa_duplicate_annotation_raises(spark):
    from earthmover_spark.llm.preference import cohens_kappa_pairs

    df = spark.createDataFrame(
        [(1, "r1", "pos"), (1, "r1", "neg"), (1, "r2", "pos")],
        "item_id long, rater_id string, label string",
    )
    with pytest.raises(EarthmoverSparkError, match="duplicate"):
        cohens_kappa_pairs(df)


# ---------------------------------------------------------------------------
# YAML registration
# ---------------------------------------------------------------------------


def test_preference_ops_registered():
    from earthmover_spark.operators import OPERATIONS

    for name in (
        "best_of_n",
        "preference_pairs",
        "win_counts",
        "bradley_terry",
        "fleiss_kappa",
        "cohens_kappa_pairs",
    ):
        assert name in OPERATIONS


# ---------------------------------------------------------------------------
# plan audits
# ---------------------------------------------------------------------------


def test_preference_pairs_extreme_plan_no_window_no_join(spark):
    """Extreme mode must stay ONE aggregation pass: both extremes fold
    into min(struct) carriers — no rank window, no self-join. The
    struct-ordered min forces sort-based aggregation (struct buffers
    aren't UnsafeRow-mutable), but it still partial-aggregates
    map-side: each task emits one row per prompt before the exchange."""
    from earthmover_spark.llm.preference import preference_pairs

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    plan = (
        preference_pairs(df, "prompt_id", "doc_id", "score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Join" not in plan
    assert "SortAggregate" in plan or "HashAggregate" in plan


def test_bradley_terry_plan_answer_sized(spark):
    """The fit's final plan reads the checkpointed answer-sized frames
    (pair counts + win totals), never the raw battle log: after the
    collapse, no scan of the input remains and nothing cartesian."""
    from earthmover_spark.llm.preference import bradley_terry

    df = spark.createDataFrame(BATTLES, "winner string, loser string")
    plan = (
        bradley_terry(df, iters=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# advantage_normalize
# ---------------------------------------------------------------------------


def test_advantage_normalize_matches_python(spark):
    from earthmover_spark.llm.preference import advantage_normalize

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    out = advantage_normalize(df, "prompt_id", "score", eps=1e-8)
    got = {r.doc_id: r.advantage for r in out.collect()}
    import statistics

    for pid in (1, 4):
        scores = [s for p, _, s in COMPLETIONS if p == pid and s is not None]
        mu = sum(scores) / len(scores)
        sd = statistics.pstdev(scores)
        for p, d, s in COMPLETIONS:
            if p == pid and s is not None:
                assert got[d] == pytest.approx((s - mu) / (sd + 1e-8))
    # NULL score -> NULL advantage, row retained
    assert got[13] is None
    # singleton and constant groups: stddev 0 -> advantage 0 (finite)
    assert got[20] == pytest.approx(0.0)
    assert got[30] == pytest.approx(0.0) and got[31] == pytest.approx(0.0)
    # every input row survives
    assert out.count() == len(COMPLETIONS)


def test_advantage_normalize_broadcast_plan(spark):
    """The join-back of the answer-sized stats frame must resolve as a
    broadcast hash join — the completions corpus never shuffles."""
    from earthmover_spark.llm.preference import advantage_normalize

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    out = advantage_normalize(df, "prompt_id", "score")
    out.collect()  # let AQE finalize the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan"
    # section (which legitimately shows the static SMJ) — judge the
    # FINAL plan only
    final = plan.split("Initial Plan")[0]
    assert "isFinalPlan=true" in final
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_bradley_terry_20_iters_no_stats_blowup(spark):
    """Regression: bare localCheckpoint preserves origin cost-model
    stats, and each MM round references strengths 3x — the preserved
    sizeInBytes compounded 3^n and planning hung by round ~10 even on
    a 3-row frame. checkpoint_cut resets the stats each round; 20
    rounds must stay fast and the final frame's sizeInBytes must stay
    a plain machine-sized number, not a compounded BigInt."""
    import time

    from earthmover_spark.llm.preference import bradley_terry

    df = spark.createDataFrame(BATTLES, "winner string, loser string")
    t0 = time.time()
    out = bradley_terry(df, iters=20, smoothing=0.5)
    got = {r.item: r.strength for r in out.collect()}
    wall = time.time() - t0
    ref = _bt_reference(BATTLES, iters=20, smoothing=0.5)
    for i, pv in ref.items():
        assert got[i] == pytest.approx(pv, rel=1e-9)
    # pre-fix this took minutes (3^20-digit BigInt multiplication);
    # the generous bound still fails decisively on any regression
    assert wall < 90, f"20 MM rounds took {wall:.0f}s — stats blowup is back"
    bits = (
        out._jdf.queryExecution().optimizedPlan().stats()
        .sizeInBytes().bit_length()
    )
    assert bits < 512, f"sizeInBytes is a {bits}-bit BigInt — stats compound again"


def test_bradley_terry_checkpoint_every_validation(spark):
    from earthmover_spark.llm.preference import bradley_terry

    df = spark.createDataFrame(BATTLES, "winner string, loser string")
    with pytest.raises(EarthmoverSparkError, match="checkpoint_every"):
        bradley_terry(df, iters=2, checkpoint_every=0)


def test_win_rates_wilson_matches_python(spark):
    from earthmover_spark.llm.preference import win_rates

    df = spark.createDataFrame(BATTLES, "winner string, loser string")
    got = {(r.item_a, r.item_b): r for r in win_rates(df).collect()}
    # a vs b: a wins 3, b wins 1 -> pair (a, b): n=4, wins_a=3
    r = got[("a", "b")]
    assert r.n_games == 4 and r.n_wins_a == 3
    assert r.rate_a == pytest.approx(0.75)

    def wilson(w, n, z=1.96):
        p = w / n
        zz = z * z
        center = (p + zz / (2 * n)) / (1 + zz / n)
        half = z * math.sqrt(p * (1 - p) / n + zz / (4 * n * n)) / (1 + zz / n)
        return center - half, center + half

    lo, hi = wilson(3, 4)
    assert r.wilson_low == pytest.approx(lo, rel=1e-12)
    assert r.wilson_high == pytest.approx(hi, rel=1e-12)
    assert 0.0 <= r.wilson_low < r.rate_a < r.wilson_high <= 1.0
    # one-sided pair (a beats d 1-0): interval stays inside [0, 1]
    rd = got[("a", "d")]
    assert rd.rate_a == 1.0 and rd.wilson_high <= 1.0 and rd.wilson_low > 0.0


def test_win_rates_registered():
    from earthmover_spark.operators import OPERATIONS

    assert "win_rates" in OPERATIONS


# ---------------------------------------------------------------------------
# validate_chat (llm/chat.py) — SFT conversation QA
# ---------------------------------------------------------------------------

CHAT_SCHEMA = (
    "conv_id long, messages array<struct<role string, content string>>"
)
CONVS = [
    (1, [("system", "be nice"), ("user", "hi"), ("assistant", "hello")]),
    (2, [("user", "hi"), ("assistant", "yo"), ("user", "more"),
         ("assistant", "sure")]),
    (3, [("user", "hi"), ("user", "again"), ("assistant", "ok")]),  # no alternation
    (4, [("assistant", "i speak first")]),                          # bad start + short
    (5, [("user", "hi"), ("assistant", " ")]),                      # blank content
    (6, [("user", "hi"), ("tool", "x"), ("assistant", "ok")]),      # unknown role
    (7, [("user", "hi"), ("system", "late"), ("assistant", "ok")]), # system not first
    (8, [("user", "trailing"), ("assistant", "ok"), ("user", "?")]),# ends on user
    (9, None),                                                      # NULL conversation
]


def test_validate_chat_flags(spark):
    from earthmover_spark.llm.chat import validate_chat

    df = spark.createDataFrame(CONVS, CHAT_SCHEMA)
    got = {r.conv_id: r for r in validate_chat(df).collect()}
    assert got[1].chat_valid and got[2].chat_valid
    assert not got[3].chat_alternates and not got[3].chat_valid
    assert not got[4].chat_has_turns and not got[4].chat_alternates
    assert not got[5].chat_content_filled
    assert got[5].chat_alternates  # structure fine, content is the problem
    assert not got[6].chat_roles_known
    assert not got[7].chat_system_leads
    assert not got[8].chat_ends_assistant
    r9 = got[9]
    assert not any([r9.chat_has_turns, r9.chat_roles_known,
                    r9.chat_content_filled, r9.chat_system_leads,
                    r9.chat_alternates, r9.chat_ends_assistant,
                    r9.chat_valid])
    # every input row survives annotate mode
    assert len(got) == len(CONVS)


def test_validate_chat_drop_and_validation(spark):
    from earthmover_spark.llm.chat import validate_chat

    df = spark.createDataFrame(CONVS, CHAT_SCHEMA)
    kept = validate_chat(df, behavior="drop")
    assert {r.conv_id for r in kept.collect()} == {1, 2}
    assert kept.columns == df.columns  # flags removed
    with pytest.raises(EarthmoverSparkError, match="behavior"):
        validate_chat(df, behavior="nope")
    with pytest.raises(EarthmoverSparkError, match="min_turns"):
        validate_chat(df, min_turns=0)
    # composes with render_chat: valid rows render cleanly
    from earthmover_spark.llm.chat import render_chat

    rendered = render_chat(kept)
    assert rendered.count() == 2


def test_validate_chat_plan_no_shuffle(spark):
    from earthmover_spark.llm.chat import validate_chat

    df = spark.createDataFrame(CONVS, CHAT_SCHEMA)
    plan = (
        validate_chat(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_validate_chat_registered():
    from earthmover_spark.operators import OPERATIONS

    assert "validate_chat" in OPERATIONS


def test_bradley_terry_tol_early_stop(spark):
    """With tol set, iters is a cap: the fit stops once strengths
    stabilize and matches a fully-converged reference."""
    from earthmover_spark.llm.preference import bradley_terry

    df = spark.createDataFrame(BATTLES, "winner string, loser string")
    got = {r.item: r.strength
           for r in bradley_terry(df, iters=100, tol=1e-9).collect()}
    # compare to the python replica run to full convergence
    ref = _bt_reference(BATTLES, iters=200, smoothing=0.5)
    for i, pv in ref.items():
        assert got[i] == pytest.approx(pv, rel=1e-6)
    with pytest.raises(EarthmoverSparkError, match="tol"):
        bradley_terry(df, tol=0.0)


def test_randomized_parity_sweep(spark):
    """Seeded random datasets x3: bradley_terry, fleiss_kappa and
    cohens_kappa_pairs all match their independent pure-Python
    replicas — parity beyond the hand-built cases."""
    import random

    from earthmover_spark.llm.preference import (
        bradley_terry,
        cohens_kappa_pairs,
        fleiss_kappa,
    )

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        items = [f"m{i}" for i in range(8)]
        battles = []
        for _ in range(120):
            a, b = rng.sample(items, 2)
            battles.append((a, b) if rng.random() < 0.6 else (b, a))
        df = spark.createDataFrame(battles, "winner string, loser string")
        got = {r.item: r.strength
               for r in bradley_terry(df, iters=6).collect()}
        ref = _bt_reference(battles, iters=6, smoothing=0.5)
        for i, pv in ref.items():
            assert got[i] == pytest.approx(pv, rel=1e-9), (seed, i)

        ann = [
            (it, rng.choice(["a", "b", "c"]))
            for it in range(30)
            for _ in range(rng.randint(1, 5))
        ]
        fdf = spark.createDataFrame(ann, "item_id long, label string")
        row = fleiss_kappa(fdf).collect()[0]
        k, p_bar, p_e = _fleiss_reference(ann)
        assert row.kappa == pytest.approx(k, rel=1e-12), seed
        assert row.p_bar == pytest.approx(p_bar, rel=1e-12)

        raters = ["r1", "r2", "r3"]
        cann = [
            (it, r, rng.choice(["x", "y"]))
            for it in range(25)
            for r in raters
            if rng.random() < 0.8
        ]
        cdf = spark.createDataFrame(
            cann, "item_id long, rater_id string, label string"
        )
        got_k = {(r.rater_a, r.rater_b): r.kappa
                 for r in cohens_kappa_pairs(cdf).collect()}
        by_rater = {}
        for it, r, l in cann:
            by_rater.setdefault(r, {})[it] = l
        for i, ra in enumerate(raters):
            for rb in raters[i + 1:]:
                shared = sorted(set(by_rater.get(ra, {}))
                                & set(by_rater.get(rb, {})))
                if not shared:
                    assert (ra, rb) not in got_k
                    continue
                pairs = [(by_rater[ra][it], by_rater[rb][it])
                         for it in shared]
                po = sum(1 for a, b in pairs if a == b) / len(pairs)
                from collections import Counter

                ca = Counter(a for a, _ in pairs)
                cb = Counter(b for _, b in pairs)
                pe = sum(ca[l] * cb.get(l, 0) for l in ca) / len(pairs) ** 2
                want = None if pe == 1 else (po - pe) / (1 - pe)
                if want is None:
                    assert got_k[(ra, rb)] is None, (seed, ra, rb)
                else:
                    assert got_k[(ra, rb)] == pytest.approx(
                        want, rel=1e-12
                    ), (seed, ra, rb)


def test_position_bias(spark):
    from earthmover_spark.llm.preference import position_bias

    # 9 of 12 battles won by the first-presented side
    rows = []
    for i, (w, l) in enumerate(BATTLES):
        rows.append((w, l, w if i < 9 else l))
    df = spark.createDataFrame(rows, "winner string, loser string, first string")
    r = position_bias(df).collect()[0]
    assert r.n_battles == 12 and r.n_first_wins == 9
    assert r.first_win_rate == pytest.approx(0.75)
    assert 0.0 <= r.wilson_low < 0.75 < r.wilson_high <= 1.0

    def wilson(w, n, z=1.96):
        p = w / n
        zz = z * z
        c = (p + zz / (2 * n)) / (1 + zz / n)
        h = z * math.sqrt(p * (1 - p) / n + zz / (4 * n * n)) / (1 + zz / n)
        return c - h, c + h

    lo, hi = wilson(9, 12)
    assert r.wilson_low == pytest.approx(lo, rel=1e-12)
    assert r.wilson_high == pytest.approx(hi, rel=1e-12)
    # 0.5 inside the interval at n=12 -> not flagged biased
    assert r.biased == (0.5 < lo or 0.5 > hi)

    # a large, clearly biased judge IS flagged
    big = spark.createDataFrame(
        [("a", "b", "a")] * 80 + [("a", "b", "b")] * 20,
        "winner string, loser string, first string",
    )
    assert position_bias(big).collect()[0].biased

    bad = spark.createDataFrame(
        [("a", "b", "zzz")], "winner string, loser string, first string"
    )
    # the mismatch guard is a violation count folded into the ONE hash
    # aggregation (no eager pre-scan), so it raises at ACTION time
    with pytest.raises(Exception, match="neither"):
        position_bias(bad).collect()


def test_position_bias_registered():
    from earthmover_spark.operators import OPERATIONS

    assert "position_bias" in OPERATIONS


def test_best_of_n_requires_tiebreak(spark):
    """Review fix: a missing tiebreak used to default to the group
    column — constant within its own window partition, so tied scores
    picked an arbitrary winner. Now it raises."""
    from earthmover_spark.llm.preference import best_of_n

    df = spark.createDataFrame(COMPLETIONS, CSCHEMA)
    with pytest.raises(EarthmoverSparkError, match="tiebreak_col"):
        best_of_n(df, "prompt_id", "score", n=1)


def test_bradley_terry_smoothing_zero_guard(spark):
    """smoothing=0 with a winless item diverges (strength 0 drops out
    of the geometric-mean pin as log NULL) — must raise, not silently
    mis-normalize; a both-sided battle set still fits fine."""
    from earthmover_spark.llm.preference import bradley_terry

    one_sided = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("a", "b"), ("b", "a")],
        "winner string, loser string",
    )
    with pytest.raises(EarthmoverSparkError, match="smoothing=0"):
        bradley_terry(one_sided, iters=2, smoothing=0.0)
    both_sided = spark.createDataFrame(
        BATTLES, "winner string, loser string"
    )
    got = {r.item: r.strength
           for r in bradley_terry(both_sided, iters=4, smoothing=0.0).collect()}
    ref = _bt_reference(BATTLES, iters=4, smoothing=0.0)
    for i, pv in ref.items():
        assert got[i] == pytest.approx(pv, rel=1e-9)


def test_validate_chat_custom_roles_alternation(spark):
    """Review fix: with a widened allowed_roles, adjacent-difference
    alone let [user, tool, assistant] pass as 'alternating' — the
    membership pin now rejects non-user/assistant turns in the body."""
    from earthmover_spark.llm.chat import validate_chat

    df = spark.createDataFrame(
        [(1, [("user", "hi"), ("tool", "result"), ("assistant", "ok")])],
        CHAT_SCHEMA,
    )
    out = validate_chat(
        df, allowed_roles=("system", "user", "assistant", "tool")
    ).collect()[0]
    assert out.chat_roles_known          # tool IS allowed in general
    assert not out.chat_alternates       # but not inside the u/a body
    assert not out.chat_valid


# ---------------------------------------------------------------------------
# calibration_bins (llm/training.py)
# ---------------------------------------------------------------------------


def test_calibration_bins_matches_python(spark):
    from earthmover_spark.llm.training import calibration_bins

    rows = [
        (0.05, 0), (0.08, 0), (0.12, 0), (0.18, 1),
        (0.55, 1), (0.58, 0), (0.95, 1), (1.0, 1), (0.97, 1),
        (None, 1), (0.5, None),
    ]
    df = spark.createDataFrame(rows, "model_score double, label int")
    got = {r.bin: r for r in calibration_bins(df, n_bins=10).collect()}
    # score 1.0 folds into the LAST bin (9), not a phantom bin 10
    assert set(got) == {0, 1, 5, 9}
    valid = [(s, y) for s, y in rows if s is not None and y is not None]
    import collections

    per_bin = collections.defaultdict(list)
    for s, y in valid:
        per_bin[min(int(s * 10), 9)].append((s, y))
    n_tot = len(valid)
    ece = 0.0
    for b, pts in per_bin.items():
        ms = sum(s for s, _ in pts) / len(pts)
        fp = sum(y for _, y in pts) / len(pts)
        ece += len(pts) / n_tot * abs(fp - ms)
        assert got[b].n == len(pts)
        assert got[b].mean_score == pytest.approx(ms)
        assert got[b].frac_positive == pytest.approx(fp)
        assert got[b].abs_gap == pytest.approx(abs(fp - ms))
    for r in got.values():
        assert r.ece == pytest.approx(ece, rel=1e-12)


def test_calibration_bins_guards(spark):
    from earthmover_spark.llm.training import calibration_bins

    df = spark.createDataFrame([(1.5, 1)], "model_score double, label int")
    with pytest.raises(EarthmoverSparkError, match=r"outside \[0, 1\]"):
        calibration_bins(df)
    ok = spark.createDataFrame([(0.5, 1)], "model_score double, label int")
    with pytest.raises(EarthmoverSparkError, match="n_bins"):
        calibration_bins(ok, n_bins=1)


def test_calibration_bins_registered():
    from earthmover_spark.operators import OPERATIONS

    assert "calibration_bins" in OPERATIONS


def test_verbosity_bias(spark):
    from earthmover_spark.llm.preference import verbosity_bias

    rows = (
        [(100, 50)] * 7      # longer side wins 7x
        + [(40, 90)] * 2     # shorter side wins 2x
        + [(60, 60)] * 3     # equal length: excluded, reported
        + [(None, 10)]       # NULL length: excluded entirely
    )
    df = spark.createDataFrame(rows, "winner_len int, loser_len int")
    r = verbosity_bias(df).collect()[0]
    assert r.n_battles == 9 and r.n_longer_wins == 7
    assert r.n_equal_len == 3
    assert r.longer_win_rate == pytest.approx(7 / 9)

    def wilson(w, n, z=1.96):
        p = w / n
        zz = z * z
        c = (p + zz / (2 * n)) / (1 + zz / n)
        h = z * math.sqrt(p * (1 - p) / n + zz / (4 * n * n)) / (1 + zz / n)
        return c - h, c + h

    lo, hi = wilson(7, 9)
    assert r.wilson_low == pytest.approx(lo, rel=1e-12)
    assert r.wilson_high == pytest.approx(hi, rel=1e-12)
    assert r.biased == (0.5 < lo or 0.5 > hi)
    big = spark.createDataFrame(
        [(100, 10)] * 90 + [(10, 100)] * 10, "winner_len int, loser_len int"
    )
    assert verbosity_bias(big).collect()[0].biased
    with pytest.raises(EarthmoverSparkError, match="column"):
        verbosity_bias(df, winner_len_col="nope")


def test_verbosity_bias_registered():
    from earthmover_spark.operators import OPERATIONS

    assert "verbosity_bias" in OPERATIONS


def test_bias_audits_degenerate_inputs(spark):
    """Second-review fix: an empty battle log (position) or an
    all-equal-length log (verbosity) is legitimate no-signal input —
    NULL rate, biased=false — not a DIVIDE_BY_ZERO crash under ANSI."""
    from earthmover_spark.llm.preference import position_bias, verbosity_bias

    empty = spark.createDataFrame(
        [], "winner string, loser string, first string"
    )
    r = position_bias(empty).collect()[0]
    assert r.n_battles == 0 and r.first_win_rate is None and not r.biased

    eq = spark.createDataFrame(
        [(60, 60), (70, 70)], "winner_len int, loser_len int"
    )
    r2 = verbosity_bias(eq).collect()[0]
    assert r2.n_battles == 0 and r2.n_equal_len == 2
    assert r2.longer_win_rate is None and not r2.biased


def test_bias_audits_null_fold_edges(spark):
    """r13 optimization pin: the NULL exclusion moved from a .filter()
    into the aggregate conditions (the pushed-down filter re-evaluated
    the audited expressions twice per row); these edges prove the fold
    is exactly the filtered semantics, including the all-NULL frame
    where a filtered sum is NULL, not 0."""
    from earthmover_spark.llm.preference import position_bias, verbosity_bias

    allnull = spark.createDataFrame(
        [(None, None), (None, 10)], "winner_len int, loser_len int"
    )
    r = verbosity_bias(allnull).collect()[0]
    # filter-then-agg over an emptied frame: sums are NULL, never 0
    assert r.n_battles is None and r.n_longer_wins is None
    assert r.n_equal_len is None and not r.biased

    mixed = spark.createDataFrame(
        [("a", "b", "a"), ("a", None, "a"), (None, "b", "b"), ("a", "b", None)],
        "winner string, loser string, first string",
    )
    rp = position_bias(mixed).collect()[0]
    # only the fully-non-NULL battle counts; first==winner there
    assert rp.n_battles == 1 and rp.n_first_wins == 1


# ---------------------------------------------------------------------------
# krippendorff_alpha
# ---------------------------------------------------------------------------


def _kripp_reference(rows):
    """Independent pairwise-disagreement replica: enumerate every
    ordered rating pair within each item explicitly (the textbook
    definition), no coincidence-matrix shortcut."""
    from collections import Counter, defaultdict

    per_item = defaultdict(list)
    for it, lab in rows:
        per_item[it].append(lab)
    kept = {i: v for i, v in per_item.items() if len(v) >= 2}
    if not kept:
        return None
    N = sum(len(v) for v in kept.values())
    do_sum = 0.0
    for v in kept.values():
        n = len(v)
        dis = sum(
            1 for i in range(n) for j in range(n) if i != j and v[i] != v[j]
        )
        do_sum += dis / (n - 1)
    d_o = do_sum / N
    pooled = Counter(l for v in kept.values() for l in v)
    de_num = N * N - sum(c * c for c in pooled.values())
    d_e = de_num / (N * (N - 1))
    return None if d_e == 0 else 1 - d_o / d_e


def test_krippendorff_alpha_matches_pairwise_replica(spark):
    from earthmover_spark.llm.preference import krippendorff_alpha

    rows = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "b"), (2, "b"),
        (3, "a"), (3, "c"), (3, "c"), (3, "c"),
        (4, "a"),              # singleton: excluded
        (5, None), (None, "a"),
    ]
    df = spark.createDataFrame(rows, "item_id long, label string")
    out = krippendorff_alpha(df).collect()[0]
    valid = [(i, l) for i, l in rows if i is not None and l is not None]
    want = _kripp_reference(valid)
    assert out.alpha == pytest.approx(want, rel=1e-12)
    assert out.n_items == 3 and out.n_items_excluded == 1
    assert out.n_ratings == 9
    assert out.alpha == pytest.approx(1 - out.d_o / out.d_e, rel=1e-12)

    import random

    for seed in (3, 17):
        rng = random.Random(seed)
        rnd = [(it, rng.choice(["x", "y", "z"]))
               for it in range(40) for _ in range(rng.randint(1, 5))]
        rdf = spark.createDataFrame(rnd, "item_id long, label string")
        got = krippendorff_alpha(rdf).collect()[0].alpha
        assert got == pytest.approx(_kripp_reference(rnd), rel=1e-12), seed


def test_krippendorff_alpha_degenerate(spark):
    from earthmover_spark.llm.preference import krippendorff_alpha

    # perfect multi-category agreement: alpha == 1
    perfect = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (2, "y")], "item_id long, label string"
    )
    assert krippendorff_alpha(perfect).collect()[0].alpha == pytest.approx(1.0)
    # single observed category: d_e == 0 -> alpha NULL, not 1.0
    one = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "x")], "item_id long, label string"
    )
    row = krippendorff_alpha(one).collect()[0]
    assert row.alpha is None and row.d_e == 0.0
    # all singletons: nothing kept, NULL alpha, everything reported
    single = spark.createDataFrame(
        [(1, "x"), (2, "y")], "item_id long, label string"
    )
    r = krippendorff_alpha(single).collect()[0]
    assert r.alpha is None and r.n_items == 0 and r.n_items_excluded == 2


def test_krippendorff_alpha_registered():
    from earthmover_spark.operators import OPERATIONS

    assert "krippendorff_alpha" in OPERATIONS
