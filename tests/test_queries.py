"""Fast regression: representative queries() entries vs their oracle_sql()
via DuckDB at sf0.001 (the driver runs the full set at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# cheap-but-representative subset: one per operator family
SUBSET = ["q1_pricing_summary", "q6_forecast_revenue", "top_orders",
          "cdc_latest_state", "cdc_asof_enrich", "cdc_user_sessions",
          "customers_without_orders", "union_key_counts", "dedup_exact",
          "doc_token_stats", "doc_word_jaccard_adjacent",
          "knn_bruteforce", "embedding_label_stats",
          "events_sliding_window", "events_props_stats",
          "doc_winnow_fingerprints", "corpus_clean_en",
          "url_canonical_dedup", "knn_ivf", "warc_roundtrip_stats",
          "hybrid_enriched_entities", "cdc_diff_epochs",
          "doc_frequent_ngrams", "doc_length_percentiles",
          "doc_tfidf_top_terms", "doc_passage_chunks",
          "doc_source_quota_sample", "dedup_minhash_clusters",
          "doc_passage_dedup", "events_distinct_users_kmv",
          "cdc_incremental_view", "embedding_kmeans_stats", "knn_lsh",
          "semantic_dup_cross_source", "doc_top_per_source",
          "doc_top_words_mg", "parts_never_shipped_bloom",
          "events_user_running_total", "events_value_median_by_type",
          "doc_weighted_sample", "cdc_dup_attribution",
          "doc_unigram_logprob", "cdc_near_dup_attribution",
          "cdc_backfill_token_stats", "cdc_changefeed",
          "cdc_quarantine_stats", "doc_decontaminate",
          "cdc_scd2_history", "events_late_data_stats",
          "cdc_text_index_search", "cdc_vector_index_search",
          "cdc_embed_backfill_ann", "doc_pagerank", "doc_pack_sequences",
          "cdc_retention_expiry", "doc_mixture_sample",
          "doc_ranked_search", "cdc_changefeed_before",
          "cdc_branch_divergence", "cdc_column_index_scan",
          "corpus_filter_funnel", "cdc_zonemap_scan", "doc_pii_scrub_stats",
          "doc_dsir_importance", "embedding_semdedup",
          "doc_winnow_overlap_pairs"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as entry_mod

    # union in the bench-only registry: pruned from the driver's operator
    # map (r3 item #8) but their oracle pins stay tested here
    return ({**entry_mod.queries(), **entry_mod.bench_only_queries()},
            entry_mod._oracle_sql_all())


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, contract, oracle_con):
    queries, oracles = contract
    out = queries[name](SF)
    got = out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out)
    want = oracle_con.execute(oracles[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        a, b = g[c], w[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float),
                               rtol=0, atol=0, equal_nan=True), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_incremental_view_epoch_invariant(contract):
    """IVM telescoping: the maintained view must be identical no matter how
    the changelog is sliced into epochs (1 epoch == plain batch aggregate)."""
    from opendataloader_pdf_ray.pipelines.cdc_queries import cdc_incremental_view

    results = [cdc_incremental_view(SF, num_epochs=e).to_pandas()
               for e in (1, 3, 8)]
    for other in results[1:]:
        pd.testing.assert_frame_equal(results[0], other)


def test_all_oracle_keys_exist(contract):
    import __ray_entry__ as entry

    queries, oracles = contract
    assert set(oracles) <= set(queries)
    assert len(queries) >= 20
    # the DRIVER-visible contract is tighter: every oracle_sql() key is a
    # queries() key (bench-only entries take their oracles with them)
    assert set(entry.oracle_sql()) <= set(entry.queries())


def test_driver_gate_covers_every_operator_family(contract):
    """The correctness driver evaluates the FIRST 50 queries() entries.
    Pin: every query outside that window is a _GATE_TAIL member (a
    documented redundant re-exercise with green rows in prior rounds), so
    each distinct operator family always sits inside the gate."""
    import __ray_entry__ as entry

    names = list(entry.queries())  # driver-visible map, not the test union
    beyond_gate = names[50:]
    assert set(beyond_gate) <= set(entry._GATE_TAIL), (
        "non-tail queries fell outside the driver's 50-slot gate: "
        f"{sorted(set(beyond_gate) - set(entry._GATE_TAIL))} — retire or "
        "tail a redundant query instead")
    # the tail really is ordered last (not interleaved)
    in_tail = [n for n in names if n in entry._GATE_TAIL]
    assert names[-len(in_tail):] == in_tail
