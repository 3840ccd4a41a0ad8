"""Driver-contract parity: run ``queries()`` entries against their
``oracle_sql()`` DuckDB oracles exactly the way the driver does (sf0.01,
column-name-sorted, row-multiset compare).  Covers the query-layer /
taxonomy / similarity entries added after the first correctness run;
the full sweep is the driver's job."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"

PARITY_KEYS = [
    "kg_ncbi_hierarchy",
    "kg_ncbi_names",
    "kg_divisions",
    "kg_subgraph",
    "kg_siblings",
    "kg_alt_labels",
    "kg_convert_id",
    "docs_ngram_jaccard",
    "ann_ivf_topk",
    "results_normalized",
    "events_sessionized",
    "kg_trait_lookup",
    "shipping_priority",
    "events_asof_view",
    "events_attribution",
    "events_sliding",
    "lineitem_quantiles",
    "lineitem_window",
    "orders_rank",
    "orders_top3_per_customer",
    "customers_no_urgent",
    "orders_building_semi",
    "events_heavy_users",
    "docs_pii_scrub",
    "docs_split",
    "docs_sample",
    "docs_source_cap",
    "docs_shuffle_shards",
    "docs_incremental_dedup",
    "docs_token_ids",
    "docs_length_band",
    "source_len_quantiles",
    "docs_bigram_fluency",
    "events_funnel",
    "events_retention",
    "lineitem_hist_quantiles",
    "docs_contamination",
    "docs_repetition",
    "docs_url_domains",
    "lineitem_orders_join",
    "orders_customer_left",
    "customer_urgent_full",
    "lineitem_price_stats",
    "orders_rollup",
    "custkeys_intersect",
    "custkeys_except",
    "orders_pivot",
    "lineitem_unpivot",
    "kg_closure",
    "parts_triangles",
    "orders_cube",
    "docs_top_tokens",
    "parts_pagerank",
    "docs_tfidf_top3",
    "events_props_sum",
    "events_hll_users",
    "events_cms_counts",
    "orders_by_month",
    "custkey_orderkeys",
    "priority_distinct_parts",
    "orders_priority_quantiles",
    "emb_label_centroids",
    "docs_pack_chunks",
    "nation_revenue",
    "emb_kmeans_assign",
    "emb_kmeans_iter",
    "docs_postings",
    "docs_keyword_tags",
    "lineitem_zscore",
    "events_mad_outliers",
    "lineitem_winsorize",
    "docs_bool_search",
    "docs_weighted_sample",
    "events_skew_stats",
    "conv_role_stats",
    "docs_chunk_windows",
    "orders_profile",
    "events_rolling",
    "lineitem_corr",
    "events_hll_per_type",
    "lineitem_mode",
    "emb_quantize",
    "conv_training_examples",
    "returned_revenue",
    "docs_dup_rate",
    "events_time_weighted",
    "source_top_tokens",
    "events_interarrival",
    "lang_quality_means",
    # session-5 additions
    "kg_sparql_star_path",
    "kg_sparql_zero_or_one",
    "kg_sparql_group_concat",
    "kg_sparql_negated",
    "kg_sparql_update",
    "kg_sparql_graph_var",
    "docs_line_dedup",
    "emb_dim_stats",
    "docs_union_by_name",
    "orders_upsert",
    "docs_hash_embed",
    "docs_embed_cluster",
    "docs_hot_lines",
    # session-6 additions
    "src_ttl_roundtrip",
    "src_ttl_parse",
    # session-7 additions
    "docs_logreg_partials",
    "docs_bpe_pair_counts",
    "src_rdfxml_roundtrip",
    "src_rdfxml_parse",
    "kg_sparql_service",
    "src_csv_roundtrip",
    # session-8 additions
    "dq_orders_checks",
    "docs_drift_psi",
]

_SF_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]


def _rows(tbl: pa.Table):
    cols = sorted(tbl.schema.names)
    t = tbl.select(cols)
    out = []
    for r in t.to_pylist():
        row = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 9) if math.isfinite(v) else v
            row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda x: tuple(str(v) for v in x))


def _materialize(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    parts = list(res.iter_batches(batch_format="pyarrow", batch_size=None))
    return (pa.concat_tables(parts, promote_options="permissive")
            if parts else pa.table({}))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("key", PARITY_KEYS)
def test_query_matches_oracle(key):
    import duckdb

    import __ray_entry__ as entry

    q = entry.queries()[key]
    sql = entry.oracle_sql()[key]
    got = _materialize(q(SF_DIR))

    con = duckdb.connect()
    for t in _SF_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.execute(sql).fetch_arrow_table()

    assert sorted(got.schema.names) == sorted(want.schema.names), (
        f"{key}: columns {got.schema.names} vs oracle {want.schema.names}")
    g, w = _rows(got), _rows(want)
    assert len(g) == len(w), f"{key}: {len(g)} rows vs oracle {len(w)}"
    assert g == w, f"{key}: value mismatch (first diff: "\
        f"{next(((a, b) for a, b in zip(g, w) if a != b), None)})"


@pytest.mark.usefixtures("ray_session")
def test_kg_linking_pr_meets_north_rule():
    """The judged kg_linking_pr entry must report P/R >= 0.95 (north
    rule band) against the fixture's embedded ground truth."""
    import __ray_entry__ as entry

    row = _materialize(entry.queries()["kg_linking_pr"](SF_DIR)).to_pylist()[0]
    assert row["precision"] >= 0.95, row
    assert row["recall"] >= 0.95, row
    assert row["tp"] <= row["n_bearing"]


@pytest.mark.usefixtures("ray_session")
def test_kg_shard_registry_contract():
    """The judged nightly-loop query must WITNESS its claims: base and
    append ingests not skipped, re-deliveries skipped (incl. after
    consolidation), consolidation emptying the shard map, and the
    merged store measured equal to the full build."""
    import __ray_entry__ as entry

    rows = _materialize(
        entry.queries()["kg_shard_registry"](SF_DIR)).to_pylist()
    by = {r["phase"]: r for r in rows}
    assert not by["base"]["skipped"] and by["base"]["novel_rows"] > 0
    assert not by["append"]["skipped"] and by["append"]["novel_rows"] > 0
    assert by["redeliver"]["skipped"]
    assert by["consolidate"]["registry_size"] == 0
    assert by["redeliver_after_consolidate"]["skipped"]
    assert by["merged"]["equals_full_build"] is True


@pytest.mark.usefixtures("ray_session")
def test_kg_linking_pr_hard_meets_north_rule():
    """Same bar on the ADVERSARIAL fixture (misspell rate 0.5, mention
    density 0.1): the fuzzy path must carry the recall, and lowercase
    misspelled common names must not cost precision (verdict r03
    item 4)."""
    import __ray_entry__ as entry

    row = _materialize(
        entry.queries()["kg_linking_pr_hard"](SF_DIR)).to_pylist()[0]
    assert row["precision"] >= 0.95, row
    assert row["recall"] >= 0.95, row
    assert row["tp"] <= row["n_bearing"]
    # low mention density actually holds (the point of the variant)
    assert row["n_bearing"] > 0


@pytest.mark.usefixtures("ray_session")
def test_kg_lineage_manifests_cover_all_rows():
    """Lineage rows must account for every partition: per-stage
    row_count equals the sum over partitions, partitions are non-empty,
    and the kg stage is at least as large as the lexicon stage."""
    import __ray_entry__ as entry

    rows = {r["stage"]: r for r in
            _materialize(entry.queries()["kg_lineage"](SF_DIR)).to_pylist()}
    assert set(rows) == {"link", "lexicon", "kg"}
    for r in rows.values():
        assert r["num_partitions"] >= 1
        assert 0 < r["min_partition_rows"] <= r["max_partition_rows"]
        assert r["row_count"] >= r["num_partitions"] * r["min_partition_rows"]
    assert rows["kg"]["row_count"] >= rows["lexicon"]["row_count"]


@pytest.mark.usefixtures("ray_session")
def test_media_features_rows_only():
    import __ray_entry__ as entry

    got = _materialize(entry.queries()["media_features"](SF_DIR))
    assert got.num_rows == 200
    assert sorted(got.schema.names) == ["media_id", "px_mean", "px_std"]
    # deterministic fake decoder ⇒ stable values across runs
    again = _materialize(entry.queries()["media_features"](SF_DIR))
    assert _rows(got) == _rows(again)


@pytest.mark.usefixtures("ray_session")
def test_kg_align_pr_meets_north_rule():
    """The judged kg_align_pr entry must report alignment P/R >= 0.95
    against the fixture's planted ground truth."""
    import __ray_entry__ as entry

    row = _materialize(entry.queries()["kg_align_pr"](SF_DIR)).to_pylist()[0]
    assert row["precision"] >= 0.95, row
    assert row["recall"] >= 0.95, row
    assert 0 < row["n_aligned"] <= row["n_eligible"] * 2
