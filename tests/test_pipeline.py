"""End-to-end pipeline slice (t1 smoke shape) on the sf0.001 tables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from shifu_spark.catalog import ColumnFlag, ColumnType, DataSetConf, ModelConfig


@pytest.fixture(scope="module")
def lineitem_mc():
    mc = ModelConfig()
    mc.dataset = DataSetConf(
        target_column="l_returnflag",
        pos_tags=["R"],
        neg_tags=["A", "N"],
        meta_columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_shipdate", "l_linestatus"],
    )
    mc.stats.max_num_bin = 8
    mc.stats.binning_method = "EqualTotal"
    return mc


def test_init_auto_type(spark, sf_dir, lineitem_mc):
    from shifu_spark.pipeline import init_columns

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ccs = init_columns(li, lineitem_mc)
    by = {c.column_name: c for c in ccs}
    assert by["l_returnflag"].column_flag == ColumnFlag.TARGET
    assert by["l_quantity"].column_type == ColumnType.NUMERICAL
    assert by["l_orderkey"].is_meta
    assert by["l_quantity"].column_stats.distinct_count > 0


def test_stats_fills_catalog(spark, sf_dir, lineitem_mc):
    from shifu_spark.pipeline import init_columns, run_stats

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ccs = run_stats(li, lineitem_mc, init_columns(li, lineitem_mc))
    by = {c.column_name: c for c in ccs}
    q = by["l_quantity"]
    assert q.column_stats.mean is not None and q.column_stats.std_dev > 0
    assert len(q.column_binning.bin_boundary) >= 2
    # counts include the missing slot as last bin
    assert len(q.column_binning.bin_count_pos) == len(q.column_binning.bin_boundary) + 1
    assert q.column_stats.iv is not None and q.column_stats.ks is not None
    assert sum(q.column_binning.bin_count_pos) + sum(q.column_binning.bin_count_neg) == q.column_stats.total_count


def test_full_pipeline_lr(spark, sf_dir, lineitem_mc):
    from shifu_spark.pipeline import run_pipeline

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ccs, models, metrics = run_pipeline(li, lineitem_mc, algorithm="LR")
    m = metrics.collect()[0]
    assert m["n_rows"] > 1000
    assert 0.0 <= m["auc"] <= 1.0
    assert len(models) == 1
    assert any(c.final_select for c in ccs)


def test_pipeline_bagged_rf(spark, sf_dir, lineitem_mc):
    from shifu_spark.pipeline import run_pipeline

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(2000)
    ccs, models, metrics = run_pipeline(li, lineitem_mc, algorithm="RF", bags=3)
    assert len(models) == 3
    assert metrics.collect()[0]["n_rows"] > 0


def test_catalog_roundtrip(tmp_path, spark, sf_dir, lineitem_mc):
    from shifu_spark.catalog import load_column_configs, save_column_configs
    from shifu_spark.pipeline import init_columns, run_stats

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ccs = run_stats(li, lineitem_mc, init_columns(li, lineitem_mc))
    p = str(tmp_path / "ColumnConfig.json")
    save_column_configs(ccs, p)
    back = load_column_configs(p)
    assert len(back) == len(ccs)
    b = {c.column_name: c for c in back}["l_quantity"]
    o = {c.column_name: c for c in ccs}["l_quantity"]
    assert b.column_stats.mean == o.column_stats.mean
    assert b.column_binning.bin_boundary == o.column_binning.bin_boundary


def test_score_ensemble_stats(spark, sf_dir, lineitem_mc):
    """mean/max/min/median columns follow ScoreObject.java:35-74 semantics."""
    from shifu_spark.ml.train import TrainParams, assemble_features, score_ensemble, train_models
    from shifu_spark.operators.normalize import normalize_df
    from shifu_spark.pipeline import init_columns, run_stats, var_select

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1500)
    ccs = var_select(run_stats(li, lineitem_mc, init_columns(li, lineitem_mc)))
    norm = normalize_df(li, ccs, tag_col="l_returnflag", pos_tags=["R"], neg_tags=["A", "N"])
    feat = [c.column_name for c in ccs if c.final_select]
    assembled = assemble_features(norm, feat)
    models = train_models(assembled, TrainParams(algorithm="LR", bags=2, bag_fraction=0.8), len(feat))
    scored = score_ensemble(assembled, models, keep_cols=["label"])
    r = scored.select(
        F.min(F.col("max") - F.col("min")).alias("span_min"),
        F.max(F.abs((F.col("model0") + F.col("model1")) / 2 - F.col("mean"))).alias("mean_err"),
        F.max(F.abs((F.col("model0") + F.col("model1")) / 2 - F.col("median"))).alias("med_err"),
    ).collect()[0]
    assert r["span_min"] >= 0
    assert r["mean_err"] < 1e-9
    assert r["med_err"] < 1e-9  # median of 2 == mean of 2
