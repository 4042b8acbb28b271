"""Empty-TABLE robustness: every operator must either produce an empty
(0-row) result or fail with a CLEAR error — never an obscure crash.

Empty PARTITIONS (some blocks empty) are exercised throughout the other
tests; fully empty tables are the degenerate boundary a 100-TB pipeline
still hits (an hour with no events, a shard with no documents)."""

import os

import pyarrow.parquet as pq
import pytest

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

# ops whose construction is data-dependent in a way that cannot produce a
# typed empty result (driver-side model fit / query-matrix build / schema
# inference on a blockless dataset) — these must raise, and the message
# must be explicit, not an internal AttributeError
EXPECTED_RAISE = {
    "op_ann_topk", "op_ann_ivf_topk",          # query matrix from the table
    "op_ann_pq_topk",                           # query matrix + codebook fit
    "op_pca_embeddings",                        # fit on empty: ValueError
    "op_pca_power_int_embeddings",              # integer fit on empty
    "op_kmeans_embeddings",                     # centroid seed from empty
    "op_embedding_near_pairs_lsh",              # projection seed from empty
    "op_cardinality_events", "op_cardinality_bloom_events",  # budget probe
    "op_mix_docs",                              # group counts probe
    # joins over schemaless (blockless) sides: clear ValueError from
    # hash_join; the *_union_tagged co-partition joins hit Ray's None
    # schema the same way
    "op_semantic_dedup_embeddings",             # k-means seed from empty
    "op_kmeans_int_embeddings",                 # integer k-means seed
    "op_ann_ivf_int_topk",                      # integer IVF quantizer seed
    "op_ann_pq_int_topk",                       # integer PQ codebook seed
    "op_semi_join_customers", "op_anti_join_customers",
    "op_left_join_orders", "op_minhash_pairs_docs", "op_tfidf_docs",
    "op_bigram_score_docs", "op_range_join_events", "pipeline_curate_docs",
    "op_skew_join_events",
    "op_length_fit_docs", "op_length_fit_by_lang_docs",  # fit on empty
    "op_linear_probe_embeddings",                        # probe fit on empty
}


# ops whose nonempty output on empty tables is CORRECT by design
EXPECTED_NONEMPTY = {
    "op_exact_quantiles_events": 3,   # one NaN row per requested quantile,
                                      # mirroring SQL quantile_disc → NULL
    "op_multimodal_features": 100,    # input is self-synthesized media rows
    "scrape_payload_1m_events": 1,    # the query unions a STATIC exposition
                                      # payload (TYPE lines + a one-sample
                                      # summary family) into the stream, so
                                      # the store holds exactly 1 KIND_SUMMARY
                                      # row even when the events table is
                                      # empty; the DuckDB oracle emits the
                                      # same static row unconditionally
}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), os.path.join(str(d), f"{t}.parquet"))
    return str(d)


def test_ops_on_empty_tables(ray_session, empty_sf):
    from vertex_ray.pipelines.op_queries import (
        OP_QUERIES,
        OP_QUERIES_INTERNAL,
    )

    unexpected = {}
    for name, fn in {**OP_QUERIES, **OP_QUERIES_INTERNAL}.items():
        try:
            r = fn(empty_sf)
            df = r.to_pandas() if hasattr(r, "to_pandas") else r
            if name in EXPECTED_RAISE:
                unexpected[name] = "expected raise, got result"
            elif len(df) != EXPECTED_NONEMPTY.get(name, 0):
                unexpected[name] = f"unexpected row count on empty input: {len(df)}"
        except Exception as ex:
            if name not in EXPECTED_RAISE:
                unexpected[name] = f"{type(ex).__name__}: {str(ex)[:80]}"
    assert not unexpected, unexpected
