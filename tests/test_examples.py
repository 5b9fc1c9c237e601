"""The example projects under examples/ run end-to-end against the
driver-generated parquet testdata."""

import json
import os

import pytest

from earthmover_spark.plans.executor import run_project

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name,dest,check", [
    ("01_orders_report", "$destinations.nation_report",
     lambda rows: {"nation", "status", "orders", "revenue"} <= set(rows[0])),
    ("02_documents_quality", "$destinations.top_docs",
     lambda rows: all(r["lang"] == "en" and r["size_bucket"] in ("long", "short")
                      for r in rows)),
    ("03_llm_curation", "$destinations.curated_corpus",
     lambda rows: {"doc_id", "text", "lang", "quality"} == set(rows[0])
     and all(float(r["quality"]) >= 0 for r in rows)
     # every 53rd doc is benchmark-contaminated, so filtered out
     and not any(int(r["doc_id"]) % 53 == 0 for r in rows)),
    ("05_sql_transform", "$destinations.top_spenders_out",
     lambda rows: len(rows) == 10
     and sorted(int(r["spend_rank"]) for r in rows) == list(range(1, 11))),
    ("07_cdc_warehouse", "$destinations.merged_out",
     lambda rows: {"o_orderkey", "o_orderstatus"} == set(rows[0])
     # every urgent order was rewritten by the changeset; others never are
     and any(r["o_orderstatus"] == "RUSHED" for r in rows)),
    ("13_web_curation_recipe", "$destinations.corpus",
     lambda rows: {"doc_id", "dedup_text", "n_chars_removed"}
     == set(rows[0])
     # the substring-dedup stage genuinely excised duplicated passages
     # (the tiny-vocab corpus repeats itself; wholly-duplicated docs
     # may legitimately end up empty)
     and sum(1 for r in rows if int(r["n_chars_removed"]) > 0) >= 5
     and len(rows) > 50),
    ("12_scaling_ablation", "$destinations.sample",
     lambda rows: {"doc_id", "text", "lang", "source", "rung"}
     == set(rows[0])
     # only rungs 0 and 1 survive the 10% filter; ~10% of 500 docs
     and all(r["rung"] in ("0", "1") for r in rows)
     and 20 <= len(rows) <= 100),
    ("11_decontamination_qa", "$destinations.corpus",
     lambda rows: {"doc_id", "lang", "source", "n_chars"} == set(rows[0])
     # benchmark members are verbatim near-dups of themselves, so the
     # decontaminated corpus never contains them
     and not any(int(r["doc_id"]) % 41 == 0 for r in rows)),
    ("08_training_export", "$destinations.shards",
     lambda rows: {"doc_id", "text", "shard", "pos", "content_hash"}
     == set(rows[0])
     # seen-state docs (every 7th) never reach the export
     and not any(int(r["doc_id"]) % 7 == 0 for r in rows)
     and {r["shard"] for r in rows} <= {"0", "1", "2", "3"}),
])
def test_example_runs(spark, tmp_path, name, dest, check):
    cfg = os.path.join(EXAMPLES, name, "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))
    rows = [json.loads(ln) for ln in open(results[dest]).read().splitlines()]
    assert rows and check(rows)


def test_stream_analytics_example(spark, tmp_path):
    """examples/06_stream_analytics: stream-stream join, session agg,
    and the stateful running counter all run from YAML over two
    parquet inboxes."""
    import glob

    from pyspark.sql import functions as F

    ev = tmp_path / "events_inbox"
    pu = tmp_path / "purchases_inbox"
    spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "click", 10.0),
            (2, "2024-01-01 10:02:00", 7, "view", 20.0),
            (3, "2024-01-01 10:50:00", 7, "click", 30.0),
            (4, "2024-01-01 11:40:00", 8, "view", 40.0),
        ],
        ["event_id", "ts_s", "user_id", "event_type", "value"],
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s") \
        .coalesce(1).write.parquet(str(ev))
    spark.createDataFrame(
        [(7, "2024-01-01 10:01:00", 9.99)],
        ["user_id", "pts_s", "amount"],
    ).withColumn("purchase_ts", F.to_timestamp("pts_s")).drop("pts_s") \
        .coalesce(1).write.parquet(str(pu))

    cfg = os.path.join(EXAMPLES, "06_stream_analytics", "earthmover.yaml")
    results = run_project(
        spark, cfg,
        overrides={
            "sources.events.file": str(ev),
            "sources.purchases.file": str(pu),
        },
        output_dir=str(tmp_path / "out"),
    )

    def read_dir(path):
        rows = []
        for part in glob.glob(path + "/part-*"):
            rows += [json.loads(ln) for ln in open(part).read().splitlines()]
        return rows

    attributed = read_dir(results["$destinations.attributed_events"])
    assert {a["event_id"] for a in attributed} == {"1", "2"}
    sessions = read_dir(results["$destinations.user_sessions"])
    # watermark passes 11:40 -> user 7's two closed sessions emit
    assert [s["n_events"] for s in sessions
            if s["user_id"] == "7"] and len(sessions) >= 1
    counts = {c["user_id"]: c for c in
              read_dir(results["$destinations.activity_counts"])}
    assert counts["7"]["n_events"] == "3" and counts["8"]["n_events"] == "1"
    # bounded-state sketches: p50/p99 per event type and heavy users
    quant = {(q["event_type"], q["prob"]): q
             for q in read_dir(results["$destinations.value_p99"])}
    # clicks: values 10, 30 -> p50 = 10 (nearest rank of 2), p99 = 30
    assert float(quant[("click", "0.5")]["quantile_est"]) == 10.0
    assert float(quant[("click", "0.99")]["quantile_est"]) == 30.0
    hh = {h["user_id"]: h for h in
          read_dir(results["$destinations.heavy_hitters"])}
    assert hh["7"]["count_est"] == "3" and hh["7"]["err"] == "0"
    assert hh["8"]["count_est"] == "1"
    # count-min frequency estimates: 4 events, 3 clicks+views split
    freq = {}
    for r in read_dir(results["$destinations.event_counts_est"]):
        if (r["event_type"] not in freq
                or int(r["n_total"]) > int(freq[r["event_type"]]["n_total"])):
            freq[r["event_type"]] = r
    assert freq["click"]["count_est"] == "2"
    assert freq["view"]["count_est"] == "2"


def test_web_corpus_qa_example(spark, tmp_path):
    """examples/09_web_corpus_qa: URL parse + blocklist + per-domain
    cap, validation report, skew report, quality tiers, weighted
    sample."""
    cfg = os.path.join(EXAMPLES, "09_web_corpus_qa", "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))
    sample = [json.loads(ln) for ln in
              open(results["$destinations.sample"]).read().splitlines()]
    assert len(sample) == 25
    assert all(r["url_domain"] != "src0-site.co.uk" for r in sample)
    assert all(int(r["quality_tier"]) >= 1 for r in sample)
    qa = {(r["column"], r["rule"]): r for r in
          [json.loads(ln) for ln in
           open(results["$destinations.qa"]).read().splitlines()]}
    assert qa[("doc_id", "unique")]["n_violations"] == "0"
    assert qa[("lang", "in_set")]["n_violations"] == "0"
    skew = [json.loads(ln) for ln in
            open(results["$destinations.skew"]).read().splitlines()]
    assert 0 < len(skew) <= 10
    assert all(int(r["n"]) <= 40 for r in skew)  # the per-domain cap held


def test_metrics_rollup_example(spark, tmp_path):
    """examples/10_metrics_rollup: rolling features, daily compaction,
    forward-filled grid, attribution, modal report."""
    cfg = os.path.join(EXAMPLES, "10_metrics_rollup", "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))
    feats = [json.loads(ln) for ln in
             open(results["$destinations.features_out"]).read().splitlines()]
    assert feats and all(int(r["n_6h"]) >= 1 for r in feats)
    grid = [json.loads(ln) for ln in
            open(results["$destinations.daily_grid_out"]).read().splitlines()]
    daily = [json.loads(ln) for ln in
             open(results["$destinations.daily_latest_out"]).read().splitlines()]
    # the filled grid covers at least as many (user, day) cells as the
    # observed compaction, and fills every cell with a value
    assert len(grid) >= len(daily)
    assert all(r["value"] != "" for r in grid)
    credited = [json.loads(ln) for ln in
                open(results["$destinations.credited_out"]).read().splitlines()]
    assert credited and any(r["touch_type"] in ("view", "click")
                            for r in credited)
    modal = [json.loads(ln) for ln in
             open(results["$destinations.modal_out"]).read().splitlines()]
    assert modal and all(int(r["n_mode"]) >= 1 for r in modal)
    # merged quantile sketch: 3 probs per event_type, estimates
    # monotone in prob, sample bounded by 2k (two k=256 period
    # sketches merged down to <= 256 per group)
    quant = [json.loads(ln) for ln in
             open(results["$destinations.quantiles_out"]).read().splitlines()]
    by_type = {}
    for r in quant:
        by_type.setdefault(r["event_type"], {})[r["prob"]] = float(
            r["quantile_est"]
        )
        assert int(r["n_sample"]) <= 256
    for probs in by_type.values():
        assert set(probs) == {"0.5", "0.95", "0.99"}
        assert probs["0.5"] <= probs["0.95"] <= probs["0.99"]
    # merged KMV sketch: exact below k, so the estimate equals the
    # true distinct user count at this scale
    du = [json.loads(ln) for ln in
          open(results["$destinations.distinct_users_out"]).read()
          .splitlines()]
    assert len(du) == 1
    true_users = spark.read.parquet(SF_DIR + "/events.parquet") \
        .select("user_id").distinct().count()
    if true_users <= 256:
        assert int(du[0]["n_distinct_est"]) == true_users
    else:
        est = int(du[0]["n_distinct_est"])
        assert abs(est - true_users) / true_users < 0.25


def test_data_selection_example(spark, tmp_path):
    """examples/14_data_selection: DSIR weights toward an en target,
    Gumbel-top-k resample, CCNet tiers per language."""
    cfg = os.path.join(EXAMPLES, "14_data_selection", "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))
    sel = [json.loads(ln) for ln in
           open(results["$destinations.selected_out"]).read().splitlines()]
    assert len(sel) == 100
    assert len({r["doc_id"] for r in sel}) == 100  # without replacement
    tiers = [json.loads(ln) for ln in
             open(results["$destinations.tiers_out"]).read().splitlines()]
    by_lang = {}
    for r in tiers:
        by_lang.setdefault(r["lang"], []).append(r["tier"])
    for lang, ts in by_lang.items():
        counts = {t: ts.count(t) for t in ("head", "middle", "tail")}
        # ntile: equal thirds within 1
        assert max(counts.values()) - min(counts.values()) <= 1, lang


def test_web_graph_example(spark, tmp_path):
    """16_web_graph: links -> host graph -> harmonic ranks + anchor
    text + dataset card, end to end from YAML."""
    cfg = os.path.join(EXAMPLES, "16_web_graph", "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))

    edges = [json.loads(ln) for ln in
             open(results["$destinations.hostgraph"]).read().splitlines()]
    hosts = {e["src_host"] for e in edges}
    assert hosts == {f"site{i}.example" for i in range(11)}
    # every page links out to hostN.example; ext links on doc_id%3==0
    assert any(e["dst_host"].startswith("host") for e in edges)
    assert any(e["dst_host"].startswith("ext") for e in edges)
    # relative /local links resolve to the source host (self-edges)
    assert any(e["src_host"] == e["dst_host"] for e in edges)

    ranks = [json.loads(ln) for ln in
             open(results["$destinations.ranks"]).read().splitlines()]
    assert {r["node"] for r in ranks} >= hosts
    # pure sinks (hostN/extN have no out-edges) rank 0
    sinks = [r for r in ranks if r["node"].startswith("host")]
    assert sinks and all(r["harmonic_c"] == "0.0" for r in sinks)

    anchors = [json.loads(ln) for ln in
               open(results["$destinations.anchors"]).read().splitlines()]
    per_host = {}
    for a in anchors:
        per_host.setdefault(a["dst_host"], []).append(a["term"])
    # every hostN.example is anchored with "read <n>"
    for i in range(7):
        assert "read" in per_host[f"host{i}.example"]
    for i in range(5):
        assert set(per_host[f"ext{i}.org"]) >= {"more", "info"}

    card = [json.loads(ln) for ln in
            open(results["$destinations.card"]).read().splitlines()]
    assert len(card) == 20 and all(int(c["n_docs"]) > 0 for c in card)


def test_quality_scoring_example(spark, tmp_path):
    """17_quality_scoring: train the hashed linear quality model on a
    labeled slice, score the corpus with the broadcast weight frame,
    cut keep/review/drop tiers, filter to keep — end to end from YAML."""
    cfg = os.path.join(EXAMPLES, "17_quality_scoring", "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))
    scored = [json.loads(ln) for ln in
              open(results["$destinations.scored_out"]).read().splitlines()]
    n_docs = spark.read.parquet(SF_DIR + "/documents.parquet").count()
    assert len(scored) == n_docs  # every doc tokenizes at this SF
    for r in scored:
        s, t = float(r["model_score"]), r["tier"]
        assert 0.0 <= s <= 1.0
        # the tier must agree with the thresholds the YAML declares
        want = "drop" if s < 0.4 else ("review" if s < 0.6 else "keep")
        assert t == want, r
    # the trained model separates the labeled classes in aggregate:
    # en docs (the positives) must outscore the rest on average
    langs = {str(r["doc_id"]): r["lang"] for r in (
        row.asDict() for row in
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .select("doc_id", "lang").collect())}
    en = [float(r["model_score"]) for r in scored
          if langs[str(r["doc_id"])] == "en"]
    rest = [float(r["model_score"]) for r in scored
            if langs[str(r["doc_id"])] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)
    keep = [json.loads(ln) for ln in
            open(results["$destinations.keep_out"]).read().splitlines()]
    assert all(r["tier"] == "keep" for r in keep)
    assert {r["doc_id"] for r in keep} == {
        r["doc_id"] for r in scored if r["tier"] == "keep"}
    cal = [json.loads(ln) for ln in
           open(results["$destinations.calibration_out"]).read().splitlines()]
    assert 1 <= len(cal) <= 5
    assert sum(int(r["n"]) for r in cal) == n_docs
    # one ece, repeated per bin, consistent with the bins themselves
    eces = {r["ece"] for r in cal}
    assert len(eces) == 1
    want_ece = sum(int(r["n"]) / n_docs * abs(float(r["frac_positive"])
                   - float(r["mean_score"])) for r in cal)
    assert float(eces.pop()) == pytest.approx(want_ece, abs=1e-9)


def test_preference_data_example(spark, tmp_path):
    """18_preference_data: arena battles -> Bradley-Terry leaderboard
    + win matrix; scored completions -> DPO pairs + best-of-n; rater
    agreement audit — the post-training data loop end to end from YAML."""
    cfg = os.path.join(EXAMPLES, "18_preference_data", "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))
    board = [json.loads(ln) for ln in
             open(results["$destinations.leaderboard_out"]).read().splitlines()]
    assert len(board) == 30
    # planted world: strength grows with item id -> the fit must put
    # the top third of items well above the bottom third on average
    top = [float(r["strength"]) for r in board if int(r["item"]) >= 20]
    bot = [float(r["strength"]) for r in board if int(r["item"]) < 10]
    assert sum(top) / len(top) > 2 * (sum(bot) / len(bot))
    # leaderboard arrives sorted by strength descending
    strengths = [float(r["strength"]) for r in board]
    assert strengths == sorted(strengths, reverse=True)
    # bookkeeping: wins + losses == games, globally consistent
    assert all(int(r["n_wins"]) + int(r["n_losses"]) == int(r["n_games"])
               for r in board)
    n_events = spark.read.parquet(SF_DIR + "/events.parquet").count()
    assert sum(int(r["n_wins"]) for r in board) == n_events

    pairs = [json.loads(ln) for ln in
             open(results["$destinations.dpo_out"]).read().splitlines()]
    assert pairs and all(
        float(p["margin"]) >= 0.3
        and float(p["chosen_score"]) > float(p["rejected_score"])
        and p["chosen_text"] and p["rejected_text"]
        for p in pairs)
    # one pair per prompt in extreme mode
    assert len({p["prompt_id"] for p in pairs}) == len(pairs)

    best = [json.loads(ln) for ln in
            open(results["$destinations.best_out"]).read().splitlines()]
    assert len(best) == 50  # every prompt has a winner
    # the best-of-n winner per prompt IS each DPO pair's chosen side
    best_by_prompt = {b["prompt_id"]: b["doc_id"] for b in best}
    assert all(best_by_prompt[p["prompt_id"]] == p["chosen_id"]
               for p in pairs)

    agree = [json.loads(ln) for ln in
             open(results["$destinations.agreement_out"]).read().splitlines()]
    assert len(agree) == 6  # C(4,2) rater pairs
    assert all(-1.0 <= float(r["kappa"]) <= 1.0 for r in agree)

    wm = [json.loads(ln) for ln in
          open(results["$destinations.win_matrix_out"]).read().splitlines()]
    assert sum(int(r["n_wins"]) for r in wm) == n_events

    mus = [json.loads(ln) for ln in
           open(results["$destinations.matchups_out"]).read().splitlines()]
    assert sum(int(r["n_games"]) for r in mus) == n_events
    assert all(0.0 <= float(r["wilson_low"]) <= float(r["rate_a"])
               <= float(r["wilson_high"]) <= 1.0 for r in mus)
