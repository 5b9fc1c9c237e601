"""Operator registry: one pure function per reference operation.

Registry mirrors the reference's dispatch table
(earthmover/operations/operation.py:30-58) — all 22 operations — plus
engine extensions (dedup / similarity / text analysis, SURVEY.md §7.2
step 10).

Each operator is ``fn(df: DataFrame, *, config...) -> DataFrame`` (joins
and unions additionally take a ``registry`` of named DataFrames).
"""

from earthmover_spark.llm import (
    bpe,
    clustering,
    curation,
    dedup,
    embeddings,
    retrieval,
    sampling,
    textstats,
    training,
)
from earthmover_spark.operators import (
    column,
    dataframe,
    diff,
    fuzzy,
    graph,
    groupby,
    profile,
    row,
    setsim,
    sketch,
    skew,
    temporal,
    url,
    validate,
    zorder,
)
from earthmover_spark.streaming import ops as streaming_ops

OPERATIONS = {
    # column ops (earthmover/operations/column.py)
    "add_columns": column.add_columns,
    "modify_columns": column.modify_columns,
    "duplicate_columns": column.duplicate_columns,
    "rename_columns": column.rename_columns,
    "drop_columns": column.drop_columns,
    "keep_columns": column.keep_columns,
    "combine_columns": column.combine_columns,
    "map_values": column.map_values,
    "date_format": column.date_format,
    "snake_case_columns": column.snake_case_columns,
    "lowercase_columns": column.lowercase_columns,
    "uppercase_columns": column.uppercase_columns,
    # row ops (earthmover/operations/row.py)
    "distinct_rows": row.distinct_rows,
    "filter_rows": row.filter_rows,
    "sort_rows": row.sort_rows,
    "limit_rows": row.limit_rows,
    "flatten": row.flatten,
    # frame ops (earthmover/operations/dataframe.py)
    "join": dataframe.join,
    "union": dataframe.union,
    "melt": dataframe.melt,
    "pivot": dataframe.pivot,
    "debug": dataframe.debug,
    # group ops (earthmover/operations/groupby.py)
    "group_by": groupby.group_by,
    "group_by_with_rank": groupby.group_by_with_rank,
    # engine extensions beyond the reference surface
    "semi_join": dataframe.semi_join,
    "intersect_rows": dataframe.intersect_rows,
    "except_rows": dataframe.except_rows,
    "group_by_rollup": groupby.group_by_rollup,
    "salted_group_by": skew.salted_group_by,
    "salted_join": skew.salted_join,
    "explode_column": row.explode_column,
    "unnest_struct": row.unnest_struct,
    "window_calc": groupby.window_calc,
    "top_n_rows": groupby.top_n_rows,
    "window_agg": temporal.window_agg,
    "sessionize": temporal.sessionize,
    "asof_join": temporal.asof_join,
    "interval_join": temporal.interval_join,
    "scd2_history": temporal.scd2_history,
    "latest_rows": temporal.latest_rows,
    "funnel": temporal.funnel,
    "retention_cohorts": temporal.retention_cohorts,
    "merge_upsert": dataframe.merge_upsert,
    "flag_outliers": groupby.flag_outliers,
    "filter_percentile_band": groupby.filter_percentile_band,
    "winsorize": groupby.winsorize,
    "trend_per_key": groupby.trend_per_key,
    # streaming-only helper: bound state for windowed aggs on `stream:`
    # sources (no-op semantics change on batch frames)
    "with_watermark": lambda df, *, column, delay: df.withWatermark(column, delay),
    # streaming surface as YAML operations (over `stream: True` sources):
    # watermarked window/session aggs, bounded-state dedup, stream-stream
    # join (`right:` node ref), stream-static enrichment (`static_df:`
    # node ref), and the applyInPandasWithState running counter
    "windowed_agg_stream": streaming_ops.windowed_agg_stream,
    "sessionize_stream": streaming_ops.sessionize_stream,
    "dedup_stream": streaming_ops.dedup_stream,
    "join_stream": streaming_ops.join_streams,
    "enrich_stream": streaming_ops.enrich_stream,
    "running_counts": streaming_ops.running_counts_stream,
    "latest_state_stream": streaming_ops.latest_state_stream,
    "attribution_stream": streaming_ops.attribution_stream,
    # LLM-pipeline extensions, driveable from YAML like any operation.
    # `resolve_duplicates` takes `pairs:` and `decontaminate` takes
    # `benchmark:` node references, resolved by the executor like join
    # `sources:`.
    "exact_dedup": dedup.exact_dedup,
    "lsh_pairs": dedup.lsh_candidate_pairs,
    "resolve_duplicates": curation.resolve_duplicates,
    "decontaminate": curation.decontaminate,
    "repetition_stats": curation.repetition_stats,
    "redact_pii": curation.redact_pii,
    "strip_markup": curation.strip_markup,
    "dedup_spans": curation.dedup_spans,
    "quality_classifier": textstats.quality_classifier,
    "compression_ratio": textstats.compression_ratio,
    "bpe_tokenize": bpe.bpe_tokenize,
    "tfidf_top_terms": textstats.tfidf_top_terms,
    "quality_score": textstats.quality_score,
    "lang_id": textstats.lang_id,
    "fingerprint": textstats.fingerprint,
    "winnow_fingerprints": textstats.winnow_fingerprints,
    "winnow_near_dups": textstats.winnow_near_dups,
    "chunk_documents": sampling.chunk_documents,
    "deterministic_sample": sampling.deterministic_sample,
    "stratified_sample": sampling.stratified_sample,
    "cap_per_group": sampling.cap_per_group,
    "budget_sample": sampling.budget_sample,
    "temperature_mix": sampling.temperature_mix,
    "split_dataset": sampling.split_dataset,
    "unigram_logprob": textstats.unigram_logprob,
    "bigram_logprob": textstats.bigram_logprob,
    "ngram_counts": textstats.ngram_counts,
    "tokenize_to_ids": textstats.tokenize_to_ids,
    "l2_normalize": embeddings.l2_normalize,
    "mean_pool": embeddings.mean_pool,
    "quantize_int8": embeddings.quantize_int8,
    "standardize_embeddings": embeddings.standardize,
    "shuffle_shard": sampling.shuffle_shard,
    "profile_table": profile.profile_table,
    "train_logreg": training.train_logreg_hashed,
    "binary_metrics": training.binary_metrics,
    "pagerank": graph.pagerank,
    "triangle_count": graph.triangle_count,
    "zorder_key": zorder.zorder_key,
    "cluster_by_zorder": zorder.cluster_by_zorder,
    "novel_docs": dedup.novel_docs,
    "distinct_sketch": sketch.distinct_sketch,
    "merge_sketches": sketch.merge_sketches,
    "sketch_estimate": sketch.sketch_estimate,
    "bm25_scores": retrieval.bm25_scores,
    "inverted_index": retrieval.inverted_index,
    "kmeans_lloyd": clustering.kmeans_lloyd,
    "fuzzy_self_pairs": fuzzy.fuzzy_self_pairs,
    "snapshot_diff": diff.snapshot_diff,
    "diff_summary": diff.diff_summary,
    "validate_table": validate.validate_table,
    "parse_urls": url.parse_urls,
    "filter_domains": url.filter_domains,
    "jaccard_pairs": setsim.jaccard_self_pairs,
    "weighted_sample": sampling.weighted_sample,
    "epoch_repeat": sampling.epoch_repeat,
    "attribution": temporal.attribution,
    "histogram": profile.histogram,
    "tfidf_cosine_pairs": setsim.tfidf_cosine_pairs,
    "downsample_latest_stream": streaming_ops.downsample_latest_stream,
    "key_skew_report": skew.key_skew_report,
    "mode_per_group": groupby.mode_per_group,
    "quantile_bucket": groupby.quantile_bucket,
    "split_sentences": textstats.split_sentences,
    "extract_json": dataframe.extract_json,
    "downsample_latest": temporal.downsample_latest,
    "resample_ffill": temporal.resample_ffill,
    "rolling_agg": temporal.rolling_agg,
}

__all__ = ["OPERATIONS", "column", "row", "dataframe", "groupby", "skew"]
