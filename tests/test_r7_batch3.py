"""Round-7 batch 3: burstiness / Hill / Page-Hinkley / semantic shards —
operator-level contracts over the real sf0.001 tables."""

from __future__ import annotations

from datafusion_functions_extra_spark import suite

SF = "/root/testdata/sf0.001"


def test_burstiness_content_words_exceed_function_words(spark):
    rows = suite.QUERIES["text_term_burstiness"](spark, SF).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.burstiness >= 1.0  # cf >= df by construction
        assert r.df <= r.cf
        # bursty terms sit BELOW the Poisson document-frequency curve
        assert r.df_ratio <= 1.0 + 1e-6, r


def test_hill_alpha_positive_finite(spark):
    r = suite.QUERIES["orders_hill_tail_index"](spark, SF).collect()[0]
    assert r.k == 200
    assert r.xmin_dollars > 0
    assert 0.1 < r.hill_alpha < 100.0


def test_page_hinkley_alarm_fields_consistent(spark):
    rows = suite.QUERIES["events_page_hinkley"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.max_ph_micro >= 0
        if r.n_alarm_hours == 0:
            assert r.first_alarm_idx == -1
        else:
            assert 1 <= r.first_alarm_idx <= r.n_hours


def test_semantic_shards_partition_everything(spark):
    rows = suite.QUERIES["embedding_semantic_shards"](spark, SF).collect()
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == n_emb  # shards tile the set
    assert all(0 <= r.shard <= 15 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert -1.0 <= r.mean_intra_cos <= 1.0


def test_slo_burn_alerts_exceed_both_thresholds(spark):
    rows = suite.QUERIES["events_slo_burn_alerts"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.burn_1h > 1.1 - 1e-6 and r.burn_6h > 1.05 - 1e-6
        assert r.e1 <= r.t1 and r.e6 <= r.t6
        assert r.t6 >= r.t1  # the 6h window contains the hour


def test_softdedup_retention_bounds(spark):
    rows = suite.QUERIES["docs_softdedup_reweight"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.retention <= 1.0 + 1e-9
        assert r.eff_tokens <= r.raw_tokens + 1e-6


def test_croston_forecast_positive(spark):
    rows = suite.QUERIES["parts_croston_demand"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_demand_weeks >= 8
        assert r.z_hat > 0 and r.p_hat >= 1.0 - 1e-9
        assert abs(r.sba_forecast - 0.9 * r.croston_forecast) < 1e-5


def test_cdc_incremental_partitions_bytes(spark):
    rows = suite.QUERIES["multimodal_cdc_incremental"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_dup_chunks <= r.n_chunks
        assert 0.0 <= r.ingest_dedup_ratio <= 1.0


def test_vocab_coverage_monotone(spark):
    rows = {
        r.k: r
        for r in suite.QUERIES["corpus_vocab_coverage"](spark, SF).collect()
    }
    assert set(rows) == {100, 1000, 10000}
    assert rows[100].coverage <= rows[1000].coverage <= rows[10000].coverage
    for r in rows.values():
        assert 0.0 < r.coverage <= 1.0 + 1e-9
        assert abs(r.coverage + r.oov_rate - 1.0) < 2e-6
        assert r.vocab_used <= r.k


def test_spectral_entropy_bounds(spark):
    rows = suite.QUERIES["events_spectral_entropy"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.normalized_entropy <= 1.0 + 1e-6
        assert r.spectral_entropy >= 0.0


def test_pot_gpd_moments_sane(spark):
    r = suite.QUERIES["orders_pot_gpd"](spark, SF).collect()[0]
    assert r.n_excesses > 0
    assert r.mean_excess_dollars > 0
    assert r.gpd_sigma_dollars > 0
    # MoM xi can go well below -1 on a truncated/light tail with few
    # excesses (m^2/s^2 > 3); it just can't be >= 0.5 where the MoM
    # variance precondition fails upward
    assert -5.0 < r.gpd_xi < 0.5


def test_anisotropy_unit_norm_audit(spark):
    rows = suite.QUERIES["embedding_anisotropy"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(r.mean_self_sq - 1.0) < 1e-3  # snapping audit
        assert -1.0 <= r.anisotropy <= 1.0


def test_audio_centroid_bounds(spark):
    rows = suite.QUERIES["audio_spectral_centroid"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows[:50]:
        assert 2 <= r.dominant_period <= 14
        # centroid is a power-weighted mean of 1/p over p in 2..14
        assert 1 / 14 - 1e-6 <= r.spectral_centroid <= 0.5 + 1e-6


def test_matrix_profile_discords_and_motifs(spark):
    rows = suite.QUERIES["events_matrix_profile"](spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault((r.event_type, r.kind), []).append(r)
    for (_t, _k), grp in by_type.items():
        assert len(grp) == 3
        assert sorted(x.rk for x in grp) == [1, 2, 3]
    for r in rows:
        assert r.d2_micro >= 0
        assert abs(r.i - r.j_nn) >= 24  # non-overlapping neighbor
    # a type's worst discord distance >= its best motif distance
    for t in {r.event_type for r in rows}:
        d1 = next(r.d2_micro for r in rows if r.event_type == t and r.kind == "discord" and r.rk == 1)
        m1 = next(r.d2_micro for r in rows if r.event_type == t and r.kind == "motif" and r.rk == 1)
        assert d1 >= m1


def test_gravity_model_fit_sane(spark):
    r = suite.QUERIES["nation_gravity_model"](spark, SF).collect()[0]
    assert r.n_pairs > 10
    assert 0.0 <= r.r_squared <= 1.0 + 1e-9
    # size terms should carry positive elasticities on TPC-H-ish flows
    assert r.beta_supplier_mass > 0 and r.beta_customer_wealth > 0


def test_eb_shrinkage_pulls_toward_grand_mean(spark):
    rows = suite.QUERIES["orders_eb_shrunk_segment_means"](spark, SF).collect()
    assert len(rows) == 5
    raw = [r.raw_mean_dollars for r in rows]
    lo, hi = min(raw), max(raw)
    for r in rows:
        assert 0.0 <= r.shrink_weight <= 1.0
        # posterior lies between the raw mean and the grand-mean side
        assert lo - 1e-6 <= r.shrunk_mean_dollars <= hi + 1e-6
    # shrinkage contracts the spread (or leaves it equal when tau2 -> inf)
    shr = [r.shrunk_mean_dollars for r in rows]
    assert max(shr) - min(shr) <= (hi - lo) + 1e-6


def test_ivf_nprobe_recall_monotone(spark):
    rows = suite.QUERIES["embedding_ivf_nprobe_recall"](spark, SF).collect()
    assert len(rows) == 24  # 3 nprobe values x 8 queries
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, {})[r.nprobe] = r.hits
    for q, h in by_q.items():
        # probing more cells can only add candidates -> recall monotone
        assert h[1] <= h[2] <= h[3], (q, h)
        assert 0 <= h[3] <= 5
