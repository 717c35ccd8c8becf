"""Scale guards (round-1 verdict item #1): no query stage may collect corpus
payload columns (text / html / embeddings / sketches) onto the driver via
``take_all()`` / ``to_pandas()``. Small keyed lookup tables (dimension names,
distinct key sets, per-batch top-k results) are legitimate broadcasts and
pass; a whole-corpus payload collect fails the test.

Driver-side streaming (``iter_batches``) is exempt for FINAL result
consumption only — pipeline-internal staging must not stream the corpus
through the driver either (``TestNoDriverChunkTransit`` pins that for the
embedding block-cross-product, whose chunks are normalized and staged inside
``map_batches`` tasks since round 3).
"""

import pytest

import ray.data

# columns that must never be materialized on the driver by a query pipeline
PAYLOAD_COLS = {"text", "html", "embedding", "minhash", "gram_sketch",
                "sketch_a", "sketch_b", "pfx", "pfx_next", "text_next",
                "simhash", "blocks"}

GUARDED_QUERIES = [
    "dedup_minhash",
    "dedup_simhash",
    "dedup_exact",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "doc_adjacent_levenshtein",
    "doc_word_jaccard_adjacent",
    "q3_shipping_priority",
    "customers_without_orders",
    "knn_bruteforce",
    "knn_lsh",
    "top_customers",
    "lang_quality",
    "doc_winnow_fingerprints",
    "corpus_clean_en",
    "url_canonical_dedup",
    "events_sliding_window",
    "events_props_stats",
    "knn_ivf",
    "warc_roundtrip_stats",
    "hybrid_enriched_entities",
    "cdc_diff_epochs",
    "doc_frequent_ngrams",
    "doc_length_percentiles",  # driver sees the value-counts histogram only
    "doc_tfidf_top_terms",     # driver sees the capped (term, df) vocab only
    "doc_passage_chunks",
    "embedding_kmeans_stats",  # driver sees k-row partials, never vectors
    "doc_source_quota_sample",
    "cdc_incremental_view",   # driver sees per-(epoch,type) delta rows only
    "semantic_dup_cross_source",  # pair halves + (id, source) only shuffle
    "doc_top_per_source",     # ≤k rows per source per batch reach the shuffle
    "doc_top_words_mg",       # driver sees ≤sketch_k summary/candidate rows
    "parts_never_shipped_bloom",  # 32KB bitmap + match-sized key sets only
    "events_value_median_by_type",  # driver folds the bounded histogram only
    "doc_weighted_sample",    # driver sees <=k rows per batch (A-ES top-k)
    "cdc_near_dup_attribution",  # driver sees <=P lineage rows per epoch
    "cdc_backfill_token_stats",  # driver sees <=P lineage/seed rows
    "doc_pagerank",            # driver sees O(1) scalar rows per round
    "doc_pack_sequences",      # driver sees O(buckets×keys) offset rows
    "cdc_retention_expiry",    # driver sees <=P lineage rows per epoch
    "cdc_restore_state",       # driver sees <=P lineage rows per epoch
    "cdc_range_index_scan",    # driver sees index partition ids only
    "cdc_changefeed_timewindow",  # feed rows stream; commits drive setup
    "jsonl_roundtrip_stats",   # driver sees segment names + final stats
    "cdc_temporal_join",       # join rows stream; seed commits drive setup
    "cdc_fanin_merge",         # driver sees <=P lineage rows per epoch
]

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestNoDriverPayloadCollect:
    @pytest.mark.parametrize("name", GUARDED_QUERIES)
    def test_no_payload_collect(self, name, monkeypatch):
        collected = []
        orig_take_all = ray.data.Dataset.take_all
        orig_to_pandas = ray.data.Dataset.to_pandas

        def rec_take_all(ds, *a, **k):
            collected.append(set(ds.schema().names))
            return orig_take_all(ds, *a, **k)

        def rec_to_pandas(ds, *a, **k):
            collected.append(set(ds.schema().names))
            return orig_to_pandas(ds, *a, **k)

        monkeypatch.setattr(ray.data.Dataset, "take_all", rec_take_all)
        monkeypatch.setattr(ray.data.Dataset, "to_pandas", rec_to_pandas)

        import __ray_entry__ as entry

        all_queries = {**entry.queries(), **entry.bench_only_queries()}
        out = all_queries[name](SF)
        if isinstance(out, ray.data.Dataset):
            # consume the FINAL result by streaming (the one legitimate
            # driver materialization)
            n = sum(b.num_rows for b in out.iter_batches(batch_size=4096,
                                                         batch_format="pyarrow"))
        else:
            n = out.num_rows if hasattr(out, "num_rows") else len(out)
        assert n >= 0
        for cols in collected:
            bad = cols & PAYLOAD_COLS
            assert not bad, (
                f"{name} collected payload columns {sorted(bad)} onto the "
                f"driver (dataset columns: {sorted(cols)})")


class TestNoDriverChunkTransit:
    def test_embedding_chunks_staged_in_tasks(self, ray_session, monkeypatch):
        """Round-2 verdict item #3: `_normalized_chunks` must stage the
        corpus as task-produced object-store blocks; the driver collects
        refs only and never streams embedding batches through itself."""
        import numpy as np

        calls = []
        orig = ray.data.Dataset.iter_batches

        def rec(ds, *a, **k):
            calls.append(True)
            return orig(ds, *a, **k)

        monkeypatch.setattr(ray.data.Dataset, "iter_batches", rec)

        import ray as _ray

        from opendataloader_pdf_ray.functions import dedup as dd

        ds = ray.data.read_parquet(SF + "/embeddings.parquet",
                                   columns=["vec_id", "embedding"])
        refs = dd._normalized_chunks(ds, "vec_id", "embedding", 128)
        assert not calls, "chunk staging streamed batches through the driver"
        assert refs
        ids, mat = dd._chunk_to_mat(_ray.get(refs[0]))
        assert mat.ndim == 2 and len(ids) == mat.shape[0]
        assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)
        # chunk granularity bounded: no block larger than the requested rows
        sizes = [len(dd._chunk_to_mat(_ray.get(r))[0]) for r in refs]
        assert max(sizes) <= 128


class TestBucketScaling:
    def test_n_buckets_scales_with_cluster(self, ray_session):
        import ray

        from opendataloader_pdf_ray.pipelines.common import n_buckets

        cpus = int(ray.cluster_resources().get("CPU"))
        assert n_buckets() == max(32, 4 * cpus)

    def test_zipf_skew_bounded_bucket_load(self):
        """Key-bucketed map_groups stages: even under Zipf-skewed keys, no
        bucket holds more than (hottest key's rows) + a constant factor of the
        fair share — i.e. per-task memory is bounded by data/buckets, not by
        a fixed 1/32 of the dataset."""
        import numpy as np

        from opendataloader_pdf_ray.pipelines.common import n_buckets

        rng = np.random.RandomState(7)
        n = 200_000
        users = (rng.zipf(1.3, size=n) % 10_000).astype(np.int64)
        buckets = n_buckets()
        load = np.bincount(users % buckets, minlength=buckets)
        hottest = np.bincount(users).max()
        fair = n / buckets
        assert load.max() <= hottest + 8 * fair