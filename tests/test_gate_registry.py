"""The driver's correctness gate checks the first 50 ``queries()``
entries — pin the curated ordering so a refactor can't silently push an
operator family out of the verified window."""

from __future__ import annotations

from db2pq_spark import workload


def test_gate_priority_is_exactly_the_first_fifty():
    names = list(workload.queries())
    assert len(workload.GATE_PRIORITY) == 50
    assert names[:50] == workload.GATE_PRIORITY
    assert len(names) == len(set(names))


def test_gate_priority_names_all_registered():
    missing = [n for n in workload.GATE_PRIORITY if n not in workload.REGISTRY]
    assert missing == []


def test_gate_covers_every_operator_family():
    """One representative per family must sit inside the 50-slot
    window (the driver never sees anything past it)."""
    gate = set(workload.GATE_PRIORITY)
    families = {
        "aggregate": "q01_pricing_summary",
        "plan-pipeline": "q02_export_plan",
        "count-clamp": "q23_count_clamp",
        "sql-api": "q40_sql_api",
        "joins": "q03_top_orders",
        "anti": "q16_anti_join",
        "rollup": "q11_rollup",
        "pivot": "q22_pivot",
        "window-rank": "q07_topk_per_group",
        "set-ops": "q10_set_ops",
        "strings": "q14_scalar_functions",
        "booleans": "q18_safe_boolean",
        "numeric-modes": "q24_numeric_modes",
        "streaming-window": "q19_tumbling_window",
        "sessionization": "q20_sessionization",
        "pandas-udf": "q54_pandas_udf_scalar",
        "grouped-pandas": "q57_grouped_pandas",
        "udtf": "q80_udtf_tokens",
        "exact-dedup": "q30_exact_dedup",
        "text-profile": "q31_text_profile",
        "ngram-jaccard": "q32_ngram_jaccard",
        "cosine-topk": "q33_cosine_topk",
        "asof-join": "q34_asof_join",
        "multimodal": "q35_multimodal_features",
        "minhash": "q36_minhash_dedup",
        "fingerprints": "q43_fingerprints",
        "ivf-ann": "q46_ivf_topk",
        "range-join": "q47_range_join",
        "stateful-stream": "q68_stateful_stream",
        "components": "q82_dup_clusters",
        "chunking": "q85_chunking",
        "packing": "q86_packing",
        "validation": "q95_validation",
        "bm25": "q96_bm25",
        "repetition": "q99_repetition_profile",
        "dup-spans": "q102_duplicate_spans",
        "vocab": "q103_vocab_encode",
        "decontamination": "q104_decontamination",
        "centroids": "q105_label_centroids",
        # round-13 rotation: the newest operator families get driver-side
        # scrutiny; displaced relational variants stay oracle-checked via
        # scripts/check_oracle.py (FULLGATE).
        "unigram-soft-em": "q148_unigram_soft",
        "suffix-dedup": "q149_longest_dup_span",
        "ivf-pq": "q151_pq_adc_topk",
        "logreg": "q153_logreg_quality",
        "pagerank": "q155_pagerank",
        "pq-increment": "q157_pq_increment",
        "count-min": "q158_cms_heavy_hitters",
        "roc-auc": "q159_classifier_auc",
        "label-propagation": "q161_label_propagation",
        "token-drift": "q164_token_drift",
    }
    not_in_gate = {f: q for f, q in families.items() if q not in gate}
    assert not_in_gate == {}
