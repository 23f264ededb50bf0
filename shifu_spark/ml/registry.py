"""Model registry — persist/load trained model sets with their catalog.

Reference: core/processor/ExportModelProcessor.java:109-190 (export NN/LR/
tree specs), util/ModelSpecLoaderUtils.java (load bagged model specs),
BinaryNNSerializer/BinaryDTSerializer custom binary formats. The Spark
rebuild keeps MLlib's native save/load for the heavy artifacts and one
JSON manifest for everything else — no custom binary formats:

  <path>/manifest.json        pipeline spec + column catalog + model index
  <path>/model_<i>/           MLlib native save (per bagged model)

The manifest carries the fitted SGD weights inline (they're a vector),
so ml/sgd.py models need no directory at all. PMML/ONNX export is out of
scope (optional exporter in the reference too).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from typing import Any

from pyspark.sql import SparkSession

_MLLIB_CLASSES = {
    "LogisticRegressionModel": "pyspark.ml.classification",
    "RandomForestClassificationModel": "pyspark.ml.classification",
    "GBTClassificationModel": "pyspark.ml.classification",
    "MultilayerPerceptronClassificationModel": "pyspark.ml.classification",
    "DecisionTreeRegressionModel": "pyspark.ml.regression",
    "RandomForestRegressionModel": "pyspark.ml.regression",
    "GBTRegressionModel": "pyspark.ml.regression",
    "LinearRegressionModel": "pyspark.ml.regression",
}


def save_model_set(
    path: str,
    models: list,
    column_configs: list | None = None,
    train_params: Any = None,
    sgd_weights: list[float] | None = None,
    feature_cols: list[str] | None = None,
    nn_results: list | None = None,
    wdl_models: list | None = None,
) -> None:
    """Persist a bagged model set + metadata under one directory.

    ``nn_results`` — fitted ml/nn.py NNResult bags; like SGD weights they
    serialize inline (flat vectors + layer/activation spec).
    ``wdl_models`` — fitted ml/wdl.py WDLModel instances, likewise inline
    (the flat weight vector plus the dense/sparse/embedding spec —
    BinaryWDLSerializer.java's role, JSON instead of a custom binary)."""
    os.makedirs(path, exist_ok=True)
    index = []
    for i, m in enumerate(models):
        cls = type(m).__name__
        if cls not in _MLLIB_CLASSES:
            raise ValueError(f"unsupported model class {cls}")
        mdir = os.path.join(path, f"model_{i}")
        m.write().overwrite().save(mdir)
        index.append({"dir": f"model_{i}", "cls": cls})
    manifest = {
        "models": index,
        "feature_cols": feature_cols or [],
        "sgd_weights": sgd_weights,
        "train_params": asdict(train_params) if train_params is not None else None,
        "nn_models": [asdict(r) for r in nn_results] if nn_results else None,
        "wdl_models": [asdict(m) for m in wdl_models] if wdl_models else None,
        "column_configs": [asdict(c) for c in column_configs] if column_configs else None,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, default=str)


def load_model_set(spark: SparkSession, path: str) -> dict:
    """Load a model set saved by :func:`save_model_set`.

    Returns {"models": [...], "feature_cols", "sgd_weights",
    "train_params", "column_configs" (raw dicts), "nn_models"
    (NNResult objects)}.
    """
    import importlib

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    models = []
    for entry in manifest["models"]:
        mod = importlib.import_module(_MLLIB_CLASSES[entry["cls"]])
        cls = getattr(mod, entry["cls"])
        models.append(cls.load(os.path.join(path, entry["dir"])))
    manifest["models"] = models
    if manifest.get("nn_models"):
        from shifu_spark.ml.nn import NNResult

        manifest["nn_models"] = [NNResult(**d) for d in manifest["nn_models"]]
    if manifest.get("wdl_models"):
        from shifu_spark.ml.wdl import WDLModel

        manifest["wdl_models"] = [WDLModel(**d) for d in manifest["wdl_models"]]
    return manifest


def export_pmml(
    path: str, out_dir: str | None = None, spark: SparkSession | None = None
) -> tuple[list[str], list[str]]:
    """`shifu export -t pmml` over a saved model set: one .pmml per
    bagging member (ExportModelProcessor.java:158-173 writes
    pmmls/<name><i>.pmml the same way).

    Exports the inline-serialized members — SGD/LR weights as
    RegressionModel, NN bags as NeuralNetwork, and, when a ``spark``
    session is provided, saved MLlib tree ensembles as
    TreeModel/MiningModel documents.

    Returns ``(written, skipped)``: the written file paths, and the
    name of every bag member that produced NO .pmml — an NN member with
    a PMML-inexpressible activation (PTANH/SWISH/LEAKY_RELU; the
    reference aborts there, PMMLEncogNeuralNetworkModel.java:116), an
    MLlib member that cannot be loaded because no ``spark`` session was
    passed, or a non-tree MLlib member (its PMML, if any, comes from
    the manifest's ``sgd_weights`` vector, not from the member object).
    One inexpressible member must not abort the whole model set's
    export, but a headless batch job must still be able to DETECT a
    partial export programmatically, so the skips come back alongside
    the paths (NN skips are additionally warned).  ``skipped == []``
    means every manifest member is covered by a written document.
    """
    from shifu_spark.ml.pmml import lr_to_pmml, nn_to_pmml

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    out_dir = out_dir or os.path.join(path, "pmmls")
    os.makedirs(out_dir, exist_ok=True)
    feats = manifest.get("feature_cols") or []
    written: list[str] = []
    skipped: list[str] = []
    if manifest.get("models") and spark is None:
        # MLlib members need a session to load — without one they are
        # NOT silently omitted (that read as a complete export before
        # the r11 review pass); the caller sees exactly what's missing.
        # The 'requires spark session' suffix marks ONLY skips a session
        # would actually clear (tree members): a non-tree member (e.g.
        # LogisticRegressionModel) is skipped as 'model_i:cls' either
        # way, and a caller retrying with a session must not be told
        # otherwise (ADVICE r11)
        skipped.extend(
            f"model_{i}:{e['cls']} (requires spark session)"
            if e["cls"].startswith(("RandomForest", "GBT", "DecisionTree"))
            else f"model_{i}:{e['cls']}"
            for i, e in enumerate(manifest["models"])
        )
    elif manifest.get("models"):
        from shifu_spark.ml.pmml import mllib_tree_model_to_pmml

        loaded = load_model_set(spark, path)
        for i, m in enumerate(loaded["models"]):
            cls = type(m).__name__
            if not cls.startswith(("RandomForest", "GBT", "DecisionTree")):
                # LR-family members export (if at all) from sgd_weights,
                # not from the member object — still a member with no
                # document of its own, so it is reported, not dropped
                skipped.append(f"model_{i}:{cls}")
                continue
            p = os.path.join(out_dir, f"tree_{i}.pmml")
            with open(p, "w") as fh:
                fh.write(mllib_tree_model_to_pmml(m, feats, model_name=f"tree_{i}"))
            written.append(p)
    if manifest.get("sgd_weights"):
        w = manifest["sgd_weights"]
        # sgd weight vector layout: [w..., intercept]
        xml = lr_to_pmml(feats, w[: len(feats)], w[-1] if len(w) > len(feats) else 0.0)
        p = os.path.join(out_dir, "sgd_lr.pmml")
        with open(p, "w") as fh:
            fh.write(xml)
        written.append(p)
    for i, d in enumerate(manifest.get("nn_models") or []):
        try:
            xml = nn_to_pmml(
                feats, [int(x) for x in d["layers"]],
                [float(x) for x in d["weights"]], list(d["activations"]),
                model_name=f"nn_{i}",
            )
        except ValueError as e:
            import warnings

            warnings.warn(f"nn_{i} not PMML-expressible, skipped: {e}", stacklevel=2)
            skipped.append(f"nn_{i}")
            continue
        p = os.path.join(out_dir, f"nn_{i}.pmml")
        with open(p, "w") as fh:
            fh.write(xml)
        written.append(p)
    return written, skipped
