"""Posttrain operator tests: sensitivity, reason codes, tree encoding."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (800, 3))
    w = np.array([2.0, 0.5, 0.0])
    y = (1 / (1 + np.exp(-(x @ w))) > rng.uniform(0, 1, 800)).astype(float)
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(x, y)]
    return spark.createDataFrame(rows, "f1 double, f2 double, f3 double, label double")


class TestSensitivity:
    def test_se_ranks_by_true_weight(self, toy):
        from shifu_spark.ml.posttrain import sensitivity_se

        out = sensitivity_se(toy, ["f1", "f2", "f3"], [2.0, 0.5, 0.0], 0.0).collect()
        ranked = [r["column_name"] for r in sorted(out, key=lambda r: r["rank"])]
        assert ranked == ["f1", "f2", "f3"]  # SE ordering follows |w| for iid features
        by = {r["column_name"]: r["se"] for r in out}
        assert by["f3"] == pytest.approx(0.0, abs=1e-12)  # zero weight -> no delta

    def test_st_matches_numpy(self, toy):
        # ST mode: diff = target - maskedScore (VarSelectMapper.java:306-309)
        from shifu_spark.ml.posttrain import sensitivity_st

        pdf = toy.toPandas()
        x = pdf[["f1", "f2", "f3"]].to_numpy()
        y = pdf["label"].to_numpy()
        w = np.array([2.0, 0.5, 0.0])
        logit = x @ w
        want = []
        for j in range(3):
            masked = 1 / (1 + np.exp(-(logit - w[j] * x[:, j])))
            want.append(((y - masked) ** 2).mean())
        got = {
            r["column_name"]: r["st"]
            for r in sensitivity_st(
                toy, ["f1", "f2", "f3"], [2.0, 0.5, 0.0], 0.0, "label"
            ).collect()
        }
        for j, c in enumerate(["f1", "f2", "f3"]):
            assert got[c] == pytest.approx(want[j], rel=1e-6)

    def test_st_zero_weight_equals_base_error(self, toy):
        # masking a zero-weight column leaves the model unchanged, so ST
        # for it equals the base model's Brier score exactly
        from shifu_spark.ml.posttrain import sensitivity_st

        pdf = toy.toPandas()
        x = pdf[["f1", "f2", "f3"]].to_numpy()
        y = pdf["label"].to_numpy()
        base = 1 / (1 + np.exp(-(x @ np.array([2.0, 0.5, 0.0]))))
        brier = ((y - base) ** 2).mean()
        out = sensitivity_st(toy, ["f1", "f2", "f3"], [2.0, 0.5, 0.0], 0.0, "label").collect()
        by = {r["column_name"]: r["st"] for r in out}
        assert by["f3"] == pytest.approx(brier, rel=1e-6)

    def test_se_matches_numpy(self, toy):
        from shifu_spark.ml.posttrain import sensitivity_se

        pdf = toy.toPandas()
        x = pdf[["f1", "f2", "f3"]].to_numpy()
        w = np.array([2.0, 0.5, 0.0])
        logit = x @ w
        base = 1 / (1 + np.exp(-logit))
        want = []
        for j in range(3):
            masked = 1 / (1 + np.exp(-(logit - w[j] * x[:, j])))
            want.append(((masked - base) ** 2).mean())
        got = {r["column_name"]: r["se"] for r in sensitivity_se(toy, ["f1", "f2", "f3"], [2.0, 0.5, 0.0], 0.0).collect()}
        for j, c in enumerate(["f1", "f2", "f3"]):
            assert got[c] == pytest.approx(want[j], rel=1e-6, abs=1e-9)


class TestReasonCodes:
    def test_topk_by_abs_contribution(self, spark):
        from shifu_spark.ml.posttrain import reason_codes_linear

        df = spark.createDataFrame([(1.0, -5.0, 0.1)], "a double, b double, c double")
        out = reason_codes_linear(df, ["a", "b", "c"], [1.0, 1.0, 10.0], top_k=2).collect()[0]
        # contribs: a=1, b=5, c=1 -> top2 = [b, then a|c tie -> larger struct wins deterministically]
        assert out["reason_codes"][0] == "b"
        assert len(out["reason_codes"]) == 2


class TestTreeEncode:
    def test_leaf_encoding_matches_prediction_partition(self, spark, sf_dir):
        from shifu_spark.ml.posttrain import extract_tree, feature_importance_df, tree_path_encode
        from shifu_spark.ml.train import TrainParams, assemble_features, train_models

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(2000)
        df = li.select(
            F.col("l_quantity").alias("f1"),
            F.col("l_discount").alias("f2"),
            (F.col("l_returnflag") == "R").cast("double").alias("label"),
        )
        assembled = assemble_features(df, ["f1", "f2"], "label")
        model = train_models(assembled, TrainParams(algorithm="RF", trees=3, max_depth=3), 2)[0]
        enc = tree_path_encode(df, ["f1", "f2"], model)
        rows = enc.collect()
        assert all(len(r["tree_leaves"]) == 3 for r in rows)
        # identical feature rows must land in identical leaves
        seen = {}
        for r in rows:
            key = (r["f1"], r["f2"])
            if key in seen:
                assert seen[key] == list(r["tree_leaves"])
            seen[key] = list(r["tree_leaves"])
        # importance ranked
        imp = feature_importance_df(model, ["f1", "f2"])
        assert len(imp) == 2 and imp[0][1] >= imp[1][1]
        # extractor sanity: at least one internal node in tree 0
        t0 = extract_tree(model._java_obj.trees()[0].rootNode())
        assert any(f >= 0 for f in t0["feature"])

    def test_pinned_tree_encoding_exact(self, spark):
        """tree_path_encode_trees against literal fixture trees must route
        every point to the hand-computed leaf (EncodeDataUDF lookup
        semantics: x <= threshold goes left; leaf id = preorder index)."""
        from shifu_spark.ml.posttrain import tree_path_encode_trees
        from shifu_spark.queries import _PINNED_TREES

        # corners of every region of both fixture trees, incl. boundaries
        pts = [
            (1, 10.0, 0.01),  # t0: f1<=25,f2<=0.05 -> 2 ; t1: f2<=0.03 -> 1
            (2, 10.0, 0.08),  # t0 -> 3 ; t1: f2>0.03,f1<=30 -> 3
            (3, 30.0, 0.00),  # t0: f1>25,f1<=40 -> 5 ; t1 -> 1
            (4, 50.0, 0.10),  # t0: f1>40 -> 6 ; t1: f1>30 -> 4
            (5, 25.0, 0.05),  # boundaries go LEFT: t0 -> 2 ; t1: 0.05>0.03, 25<=30 -> 3
            (6, 40.0, 0.03),  # t0: 40<=40 -> 5 ; t1: 0.03<=0.03 -> 1
        ]
        df = spark.createDataFrame(pts, "id long, f1 double, f2 double")
        out = {
            r["id"]: list(r["tree_leaves"])
            for r in tree_path_encode_trees(df, ["f1", "f2"], _PINNED_TREES, keep_cols=["id"]).collect()
        }
        assert out == {1: [2, 1], 2: [3, 3], 3: [5, 1], 4: [6, 4], 5: [2, 3], 6: [5, 1]}


class TestModelRegistry:
    def test_save_load_roundtrip_scores_identical(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from shifu_spark.ml.registry import load_model_set, save_model_set
        from shifu_spark.ml.train import TrainParams, assemble_features, score_ensemble, train_models

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
            F.col("l_quantity").alias("f1"),
            F.col("l_discount").alias("f2"),
            (F.col("l_returnflag") == "R").cast("double").alias("label"),
        )
        assembled = assemble_features(li, ["f1", "f2"], "label")
        params = TrainParams(algorithm="LR", num_iterations=10, bags=2, bag_fraction=0.8, seed=42)
        models = train_models(assembled, params, 2)

        path = str(tmp_path / "modelset")
        save_model_set(path, models, train_params=params, feature_cols=["f1", "f2"],
                       sgd_weights=[0.1, -0.2, 0.05])
        loaded = load_model_set(spark, path)

        assert [type(m).__name__ for m in loaded["models"]] == ["LogisticRegressionModel"] * 2
        assert loaded["feature_cols"] == ["f1", "f2"]
        assert loaded["sgd_weights"] == [0.1, -0.2, 0.05]
        assert loaded["train_params"]["algorithm"] == "LR"

        a = score_ensemble(assembled, models).agg(F.sum("mean").alias("s")).collect()[0]["s"]
        b = score_ensemble(assembled, loaded["models"]).agg(F.sum("mean").alias("s")).collect()[0]["s"]
        assert a == b  # loaded models score bit-identically


def test_registry_nn_result_roundtrip(spark, tmp_path):
    from shifu_spark.ml.nn import NNResult, nn_score_udf
    from shifu_spark.ml.registry import load_model_set, save_model_set

    res = NNResult(
        weights=[0.1] * 17, layers=[2, 4, 1], activations=["SWISH", "SIGMOID"],
        train_losses=[0.7, 0.6], epochs_run=2,
    )
    path = str(tmp_path / "nnset")
    save_model_set(path, [], feature_cols=["x1", "x2"], nn_results=[res])
    loaded = load_model_set(spark, path)
    got = loaded["nn_models"][0]
    assert got == res

    # the loaded net scores identically
    df = spark.createDataFrame([(0.5, -0.5)], "x1 double, x2 double")
    a = df.withColumn("p", nn_score_udf(["x1", "x2"], res)).first()["p"]
    b = df.withColumn("p", nn_score_udf(["x1", "x2"], got)).first()["p"]
    assert a == b
