"""PMML export round-trip tests (ExportModelProcessor parity).

Export -> parse -> score must reproduce the in-engine score bit-for-bit
(repr() float rendering round-trips exactly)."""

import math
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


class TestLrPmml:
    def test_round_trip_exact(self):
        from shifu_spark.ml.pmml import lr_to_pmml, score_pmml

        feats = ["f1", "f2", "f3"]
        w = [0.25, -1.75, 3.5]
        b = -0.125
        xml = lr_to_pmml(feats, w, b)
        row = {"f1": 1.5, "f2": -2.0, "f3": 0.5}
        want = 1.0 / (1.0 + math.exp(-(sum(wi * row[f] for wi, f in zip(w, feats)) + b)))
        assert score_pmml(xml, row) == want  # exact, not approx

    def test_structure_is_pmml_42(self):
        from shifu_spark.ml.pmml import PMML_XMLNS, lr_to_pmml

        xml = lr_to_pmml(["a"], [1.0], 0.0)
        root = ET.fromstring(xml)
        assert root.get("version") == "4.2" and PMML_XMLNS in root.tag
        tags = [t.tag.split("}")[-1] for t in root]
        assert tags == ["Header", "DataDictionary", "RegressionModel"]
        # one NumericPredictor per feature inside the RegressionTable
        preds = [e for e in root.iter() if e.tag.split("}")[-1] == "NumericPredictor"]
        assert len(preds) == 1 and preds[0].get("name") == "a"

    def test_length_mismatch_raises(self):
        from shifu_spark.ml.pmml import lr_to_pmml

        with pytest.raises(ValueError):
            lr_to_pmml(["a", "b"], [1.0], 0.0)


class TestNnPmml:
    def test_round_trip_matches_nn_forward(self):
        from shifu_spark.ml.nn import _forward, _unflatten
        from shifu_spark.ml.pmml import nn_to_pmml, score_pmml

        rng = np.random.default_rng(7)
        layers = [3, 4, 1]
        acts = ["TANH", "SIGMOID"]
        n = sum((layers[i] + 1) * layers[i + 1] for i in range(len(layers) - 1))
        w = rng.normal(0, 0.5, n)
        xml = nn_to_pmml(["x1", "x2", "x3"], layers, w.tolist(), acts)
        x = np.array([[0.3, -1.2, 2.0]])
        _, as_ = _forward(x, _unflatten(w, layers), acts)
        want = float(as_[-1][0, 0])
        got = score_pmml(xml, {"x1": 0.3, "x2": -1.2, "x3": 2.0})
        assert got == pytest.approx(want, rel=1e-12)

    def test_unsupported_activation_raises(self):
        from shifu_spark.ml.pmml import nn_to_pmml

        with pytest.raises(ValueError, match="PMML equivalent"):
            nn_to_pmml(["x"], [1, 2, 1], [0.0] * 7, ["ptanh", "sigmoid"])

    def test_relu_layer(self):
        from shifu_spark.ml.nn import _forward, _unflatten
        from shifu_spark.ml.pmml import nn_to_pmml, score_pmml

        rng = np.random.default_rng(11)
        layers = [2, 3, 1]
        acts = ["RELU", "SIGMOID"]
        n = sum((layers[i] + 1) * layers[i + 1] for i in range(len(layers) - 1))
        w = rng.normal(0, 1.0, n)
        xml = nn_to_pmml(["a", "b"], layers, w.tolist(), acts)
        x = np.array([[1.0, -0.5]])
        _, as_ = _forward(x, _unflatten(w, layers), acts)
        assert score_pmml(xml, {"a": 1.0, "b": -0.5}) == pytest.approx(
            float(as_[-1][0, 0]), rel=1e-12
        )


class TestRegistryExport:
    def test_export_pmml_from_manifest(self, tmp_path):
        from shifu_spark.ml.nn import NNResult
        from shifu_spark.ml.pmml import score_pmml
        from shifu_spark.ml.registry import export_pmml, save_model_set

        path = str(tmp_path / "mset")
        res = NNResult(
            weights=[0.1] * ((2 + 1) * 2 + (2 + 1) * 1),
            layers=[2, 2, 1],
            activations=["TANH", "SIGMOID"],
        )
        save_model_set(
            path, [], feature_cols=["f1", "f2"],
            sgd_weights=[0.5, -0.5, 0.25], nn_results=[res],
        )
        written, skipped = export_pmml(path)
        assert skipped == []
        assert [p.split("/")[-1] for p in written] == ["sgd_lr.pmml", "nn_0.pmml"]
        lr_score = score_pmml(open(written[0]).read(), {"f1": 1.0, "f2": 1.0})
        want = 1.0 / (1.0 + math.exp(-(0.5 - 0.5 + 0.25)))
        assert lr_score == want
        assert 0.0 < score_pmml(open(written[1]).read(), {"f1": 1.0, "f2": 1.0}) < 1.0

    def test_inexpressible_member_skipped_not_fatal(self, tmp_path):
        """A PTANH bag member has no PMML activation: it must be skipped
        with a warning while every OTHER member still exports — one
        inexpressible member must not abort the model set's export."""
        import warnings

        from shifu_spark.ml.nn import NNResult
        from shifu_spark.ml.registry import export_pmml, save_model_set

        path = str(tmp_path / "mset")
        ok = NNResult(
            weights=[0.1] * ((2 + 1) * 2 + (2 + 1) * 1),
            layers=[2, 2, 1],
            activations=["TANH", "SIGMOID"],
        )
        bad = NNResult(
            weights=[0.1] * ((2 + 1) * 2 + (2 + 1) * 1),
            layers=[2, 2, 1],
            activations=["PTANH", "SIGMOID"],
        )
        save_model_set(
            path, [], feature_cols=["f1", "f2"], nn_results=[bad, ok],
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            written, skipped = export_pmml(path)
        # the partial export is programmatically detectable, not just warned
        assert skipped == ["nn_0"]
        assert [p.split("/")[-1] for p in written] == ["nn_1.pmml"]
        assert any("nn_0" in str(w.message) for w in caught)


class TestTreePmml:
    @staticmethod
    def _toy(spark):
        from pyspark.ml.feature import VectorAssembler

        rng = np.random.default_rng(5)
        x = rng.normal(0, 1, (400, 3))
        y = x[:, 0] * 2 + (x[:, 1] > 0) * 3 + rng.normal(0, 0.1, 400)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(x, y)],
            "f1 double, f2 double, f3 double, label double",
        )
        return VectorAssembler(inputCols=["f1", "f2", "f3"], outputCol="features").transform(df)

    def test_rf_regressor_round_trip(self, spark):
        from pyspark.ml.regression import RandomForestRegressor

        from shifu_spark.ml.pmml import mllib_tree_model_to_pmml, score_pmml

        data = self._toy(spark)
        model = RandomForestRegressor(numTrees=3, maxDepth=4, seed=7).fit(data)
        xml = mllib_tree_model_to_pmml(model, ["f1", "f2", "f3"])
        rows = data.select("f1", "f2", "f3").limit(20).collect()
        preds = model.transform(data).select("prediction").limit(20).collect()
        for r, p in zip(rows, preds):
            got = score_pmml(xml, {"f1": r["f1"], "f2": r["f2"], "f3": r["f3"]})
            assert got == pytest.approx(p["prediction"], rel=1e-9)

    def test_gbt_regressor_round_trip(self, spark):
        from pyspark.ml.regression import GBTRegressor

        from shifu_spark.ml.pmml import mllib_tree_model_to_pmml, score_pmml

        data = self._toy(spark)
        model = GBTRegressor(maxIter=4, maxDepth=3, seed=7).fit(data)
        xml = mllib_tree_model_to_pmml(model, ["f1", "f2", "f3"])
        rows = data.select("f1", "f2", "f3").limit(20).collect()
        preds = model.transform(data).select("prediction").limit(20).collect()
        for r, p in zip(rows, preds):
            got = score_pmml(xml, {"f1": r["f1"], "f2": r["f2"], "f3": r["f3"]})
            assert got == pytest.approx(p["prediction"], rel=1e-9)

    def test_single_decision_tree_plain_treemodel(self, spark):
        from pyspark.ml.regression import DecisionTreeRegressor

        from shifu_spark.ml.pmml import mllib_tree_model_to_pmml, score_pmml

        data = self._toy(spark)
        model = DecisionTreeRegressor(maxDepth=3, seed=7).fit(data)
        xml = mllib_tree_model_to_pmml(model, ["f1", "f2", "f3"])
        assert "<TreeModel" in xml and "MiningModel" not in xml
        r = data.select("f1", "f2", "f3").limit(1).collect()[0]
        p = model.transform(data).select("prediction").limit(1).collect()[0]
        assert score_pmml(xml, dict(zip(["f1", "f2", "f3"], r))) == pytest.approx(
            p["prediction"], rel=1e-9
        )

    def test_registry_tree_export(self, spark, tmp_path):
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import RandomForestRegressor

        from shifu_spark.ml.pmml import score_pmml
        from shifu_spark.ml.registry import export_pmml, save_model_set

        data = self._toy(spark)
        model = RandomForestRegressor(numTrees=2, maxDepth=3, seed=3).fit(data)
        path = str(tmp_path / "mset")
        save_model_set(path, [model], feature_cols=["f1", "f2", "f3"])
        written, skipped = export_pmml(path, spark=spark)
        assert skipped == []
        assert len(written) == 1 and written[0].endswith("tree_0.pmml")
        # a sessionless export cannot load the MLlib member: it must be
        # REPORTED missing, not silently omitted (r11 review finding —
        # ([], []) used to read as a complete export)
        w2, s2 = export_pmml(path)
        assert w2 == []
        assert s2 == ["model_0:RandomForestRegressionModel (requires spark session)"]
        r = data.select("f1", "f2", "f3").limit(1).collect()[0]
        p = model.transform(data).select("prediction").limit(1).collect()[0]
        got = score_pmml(open(written[0]).read(), dict(zip(["f1", "f2", "f3"], r)))
        assert got == pytest.approx(p["prediction"], rel=1e-9)

    def test_sessionless_skip_labels_only_session_fixable(self, spark, tmp_path):
        """ADVICE r11: the '(requires spark session)' suffix must mark
        ONLY skips a session would actually clear. A non-tree MLlib
        member (LinearRegressionModel here) is skipped as plain
        'model_i:cls' with or without a session — a caller retrying
        with a session must not be told the retry will clear it."""
        import os

        from pyspark.ml.regression import LinearRegression, RandomForestRegressor

        from shifu_spark.ml.registry import export_pmml, save_model_set

        data = self._toy(spark)
        rf = RandomForestRegressor(numTrees=1, maxDepth=2, seed=1).fit(data)
        lin = LinearRegression(maxIter=2).fit(data)
        path = str(tmp_path / "mixed_set")
        save_model_set(path, [rf, lin], feature_cols=["f1", "f2", "f3"])
        w, s = export_pmml(path)
        assert w == []
        assert s == [
            "model_0:RandomForestRegressionModel (requires spark session)",
            "model_1:LinearRegressionModel",
        ]
        # retrying with a session clears exactly the suffixed skip
        w2, s2 = export_pmml(path, spark=spark)
        assert [os.path.basename(p) for p in w2] == ["tree_0.pmml"]
        assert s2 == ["model_1:LinearRegressionModel"]
