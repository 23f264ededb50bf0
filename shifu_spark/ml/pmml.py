"""PMML 4.2 export for trained models — `shifu export -t pmml`.

Reference: core/processor/ExportModelProcessor.java:109-190 (export entry,
one .pmml per bagging member), core/pmml/PMMLLRModelBuilder.java
(LR -> RegressionModel with logit normalization),
core/pmml/PMMLEncogNeuralNetworkModel.java + NeuralNetworkModelIntegrator
(NN -> NeuralNetwork with per-layer Neurons/Cons), PMMLUtils.savePMML.

The reference builds PMML through the jpmml object model; here the
document is emitted directly with the stdlib ElementTree — no external
dependency, same artifact contract: a standalone XML any PMML 4.2
consumer (jpmml-evaluator, openscoring, …) can score.

Scope: RegressionModel (LR / linear), NeuralNetwork (the MLP trained by
ml/nn.py), and TreeModel/MiningModel for tree ensembles
(trees_to_pmml / mllib_tree_model_to_pmml below; RF/GBT bag members
flow through registry.export_pmml with re-score parity asserted vs
both score_pmml and the MLlib transform — tests/test_pmml.py,
matching ExportModelProcessor.java:109-190's export surface).

Determinism: weights are rendered with repr() (shortest round-trip
float), so export -> parse -> score reproduces training-time scores
bit-for-bit (asserted in tests/test_pmml.py).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

PMML_XMLNS = "http://www.dmg.org/PMML-4_2"


def _pmml_root(model_name: str) -> ET.Element:
    root = ET.Element("PMML", {"version": "4.2", "xmlns": PMML_XMLNS})
    header = ET.SubElement(root, "Header", {"copyright": "shifu-spark"})
    ET.SubElement(header, "Application", {"name": "shifu-spark", "version": "2"})
    _ = model_name
    return root


def _data_dictionary(root: ET.Element, feature_names: list[str], target: str) -> None:
    dd = ET.SubElement(root, "DataDictionary", {"numberOfFields": str(len(feature_names) + 1)})
    for f in feature_names:
        ET.SubElement(dd, "DataField", {"name": f, "optype": "continuous", "dataType": "double"})
    ET.SubElement(dd, "DataField", {"name": target, "optype": "continuous", "dataType": "double"})


def _mining_schema(parent: ET.Element, feature_names: list[str], target: str) -> None:
    ms = ET.SubElement(parent, "MiningSchema")
    for f in feature_names:
        ET.SubElement(ms, "MiningField", {"name": f, "usageType": "active"})
    ET.SubElement(ms, "MiningField", {"name": target, "usageType": "target"})


def lr_to_pmml(
    feature_names: list[str],
    weights: list[float],
    intercept: float,
    model_name: str = "model",
    target: str = "target",
) -> str:
    """Logistic regression -> PMML RegressionModel (logit normalization).

    Mirrors PMMLLRModelBuilder.java: one RegressionTable carrying the
    intercept and a NumericPredictor per feature; normalizationMethod
    ``logit`` makes consumers apply sigmoid(w·x + b).
    """
    if len(feature_names) != len(weights):
        raise ValueError("feature/weight length mismatch")
    root = _pmml_root(model_name)
    _data_dictionary(root, feature_names, target)
    rm = ET.SubElement(
        root,
        "RegressionModel",
        {
            "modelName": model_name,
            "functionName": "regression",
            "normalizationMethod": "logit",
        },
    )
    _mining_schema(rm, feature_names, target)
    table = ET.SubElement(rm, "RegressionTable", {"intercept": repr(float(intercept))})
    for f, w in zip(feature_names, weights):
        ET.SubElement(table, "NumericPredictor", {"name": f, "coefficient": repr(float(w))})
    return ET.tostring(root, encoding="unicode")


_ACT_TO_PMML = {
    # ml/nn.py ACTIVATIONS names -> PMML activationFunction names;
    # PTANH/SWISH/LEAKY_RELU have no PMML equivalent and raise
    "SIGMOID": "logistic",
    "TANH": "tanh",
    "RELU": "rectifier",
    "LINEAR": "identity",
}


def nn_to_pmml(
    feature_names: list[str],
    layers: list[int],
    weights: list[float],
    activations: list[str],
    model_name: str = "model",
    target: str = "target",
) -> str:
    """MLP -> PMML NeuralNetwork (PMMLEncogNeuralNetworkModel semantics).

    ``layers`` = [n_in, hidden..., 1]; ``weights`` is the flat vector in
    ml/nn.py order: per layer a (fan_in + 1, fan_out) matrix with the
    bias as the LAST row. Each Neuron carries its bias and one Con per
    incoming connection; NeuralOutputs maps the last neuron to the target.

    Activations outside PMML's set (PTANH, Swish, LeakyReLU) raise —
    exporting them silently as something else would corrupt scores; the
    registry (ml/registry.py) is the native path for those.
    """
    if layers[0] != len(feature_names):
        raise ValueError("layers[0] must equal len(feature_names)")
    acts = [a.upper() for a in activations]
    if len(acts) != len(layers) - 1:
        raise ValueError("need one activation per non-input layer")
    for a in acts:
        if a not in _ACT_TO_PMML:
            raise ValueError(
                f"activation {a!r} has no PMML equivalent - use the MLlib-native registry"
            )
    root = _pmml_root(model_name)
    _data_dictionary(root, feature_names, target)
    nn = ET.SubElement(
        root,
        "NeuralNetwork",
        {
            "modelName": model_name,
            "functionName": "regression",
            "activationFunction": _ACT_TO_PMML[acts[0]],
        },
    )
    _mining_schema(nn, feature_names, target)
    inputs = ET.SubElement(nn, "NeuralInputs", {"numberOfInputs": str(layers[0])})
    for i, f in enumerate(feature_names):
        ni = ET.SubElement(inputs, "NeuralInput", {"id": f"0,{i}"})
        df = ET.SubElement(ni, "DerivedField", {"optype": "continuous", "dataType": "double"})
        ET.SubElement(df, "FieldRef", {"field": f})
    # weight layout mirror of ml/nn.py:_shapes — (fan_in+1, fan_out), bias last row
    off = 0
    prev_ids = [f"0,{i}" for i in range(layers[0])]
    for li in range(1, len(layers)):
        fan_in, fan_out = layers[li - 1], layers[li]
        mat_size = (fan_in + 1) * fan_out
        mat = weights[off : off + mat_size]
        off += mat_size
        layer_el = ET.SubElement(
            nn,
            "NeuralLayer",
            {"numberOfNeurons": str(fan_out), "activationFunction": _ACT_TO_PMML[acts[li - 1]]},
        )
        new_ids = []
        for j in range(fan_out):
            nid = f"{li},{j}"
            new_ids.append(nid)
            bias = mat[fan_in * fan_out + j]  # last row = bias
            neuron = ET.SubElement(layer_el, "Neuron", {"id": nid, "bias": repr(float(bias))})
            for i, frm in enumerate(prev_ids):
                w = mat[i * fan_out + j]
                ET.SubElement(neuron, "Con", {"from": frm, "weight": repr(float(w))})
        prev_ids = new_ids
    outs = ET.SubElement(nn, "NeuralOutputs", {"numberOfOutputs": "1"})
    no = ET.SubElement(outs, "NeuralOutput", {"outputNeuron": prev_ids[0]})
    df = ET.SubElement(no, "DerivedField", {"optype": "continuous", "dataType": "double"})
    ET.SubElement(df, "FieldRef", {"field": target})
    return ET.tostring(root, encoding="unicode")


def _tree_node_el(parent: ET.Element, tree: dict, idx: int, feature_names: list[str], predicate: ET.Element | None) -> None:
    """Emit one PMML Node (recursive). MLlib ContinuousSplit semantics:
    go LEFT iff feature <= threshold -> left child predicate
    lessOrEqual, right child greaterThan."""
    node = ET.SubElement(parent, "Node", {"score": repr(float(tree["prediction"][idx]))})
    if predicate is None:
        ET.SubElement(node, "True")
    else:
        node.append(predicate)
    f = tree["feature"][idx]
    if f >= 0:
        t = repr(float(tree["threshold"][idx]))
        le = ET.Element("SimplePredicate", {"field": feature_names[f], "operator": "lessOrEqual", "value": t})
        gt = ET.Element("SimplePredicate", {"field": feature_names[f], "operator": "greaterThan", "value": t})
        _tree_node_el(node, tree, tree["left"][idx], feature_names, le)
        _tree_node_el(node, tree, tree["right"][idx], feature_names, gt)


def trees_to_pmml(
    feature_names: list[str],
    trees: list[dict],
    tree_weights: list[float] | None = None,
    method: str = "average",
    model_name: str = "model",
    target: str = "target",
) -> str:
    """Tree ensemble -> PMML MiningModel with Segmentation
    (TreeEnsemblePMMLTranslator.java semantics).

    ``trees`` are ml/posttrain.extract_tree dicts (feature/threshold/
    left/right/prediction parallel arrays). ``method``: "average" (RF
    regression / probability forests) or "sum" (GBT; pass the per-tree
    ``tree_weights`` MLlib exposes as treeWeights — encoded as PMML
    Segment weights). A single tree exports as a plain TreeModel.
    """
    if method not in ("average", "sum", "weightedAverage"):
        raise ValueError(method)
    root = _pmml_root(model_name)
    _data_dictionary(root, feature_names, target)
    if len(trees) == 1 and tree_weights is None:
        tm = ET.SubElement(root, "TreeModel", {
            "modelName": model_name, "functionName": "regression",
            "splitCharacteristic": "binarySplit",
        })
        _mining_schema(tm, feature_names, target)
        _tree_node_el(tm, trees[0], 0, feature_names, None)
        return ET.tostring(root, encoding="unicode")
    mm = ET.SubElement(root, "MiningModel", {"modelName": model_name, "functionName": "regression"})
    _mining_schema(mm, feature_names, target)
    seg = ET.SubElement(mm, "Segmentation", {"multipleModelMethod": method})
    for i, tree in enumerate(trees):
        attrs = {"id": str(i)}
        if tree_weights is not None:
            attrs["weight"] = repr(float(tree_weights[i]))
        s = ET.SubElement(seg, "Segment", attrs)
        ET.SubElement(s, "True")
        tm = ET.SubElement(s, "TreeModel", {
            "modelName": f"{model_name}_t{i}", "functionName": "regression",
            "splitCharacteristic": "binarySplit",
        })
        _mining_schema(tm, feature_names, target)
        _tree_node_el(tm, tree, 0, feature_names, None)
    return ET.tostring(root, encoding="unicode")


def mllib_tree_model_to_pmml(model, feature_names: list[str], model_name: str = "model") -> str:
    """Export a fitted MLlib tree model (DecisionTree/RandomForest/GBT
    regressor or classifier) straight from its JVM structure."""
    from shifu_spark.ml.posttrain import extract_tree

    jm = model._java_obj
    cls = type(model).__name__
    # py4j proxies claim every attribute, so dispatch on the model CLASS,
    # not hasattr (calling .trees() on a single DecisionTree model throws)
    if cls.startswith(("RandomForest", "GBT")):
        trees = [extract_tree(jt.rootNode()) for jt in jm.trees()]
        if cls.startswith("GBT"):
            weights = [float(w) for w in jm.treeWeights()]
            return trees_to_pmml(feature_names, trees, weights, "sum", model_name)
        return trees_to_pmml(feature_names, trees, None, "average", model_name)
    return trees_to_pmml(feature_names, [extract_tree(jm.rootNode())], None, "average", model_name)


# ---------------------------------------------------------------------------
# Minimal evaluator — test-side consumer proving the artifact is scoreable
# ---------------------------------------------------------------------------

def _strip(tag: str) -> str:
    return tag.split("}", 1)[-1]


def score_pmml(xml: str, row: dict[str, float]) -> float:
    """Score one row against an exported PMML doc (RegressionModel with
    logit normalization, or NeuralNetwork). Used by tests to prove
    export -> consume round-trips exactly; NOT a production scorer."""
    import math

    def walk_tree_model(tm: ET.Element) -> float:
        def node_matches(n: ET.Element) -> bool:
            for p in n:
                t = _strip(p.tag)
                if t == "True":
                    return True
                if t == "SimplePredicate":
                    v, x = float(p.get("value")), row[p.get("field")]
                    return x <= v if p.get("operator") == "lessOrEqual" else x > v
            return False

        node = next(e for e in tm if _strip(e.tag) == "Node")
        while True:
            kids = [e for e in node if _strip(e.tag) == "Node"]
            if not kids:
                return float(node.get("score"))
            node = next(k for k in kids if node_matches(k))

    root = ET.fromstring(xml)
    for child in root:
        tag = _strip(child.tag)
        if tag == "TreeModel":
            return walk_tree_model(child)
        if tag == "MiningModel":
            seg = next(e for e in child if _strip(e.tag) == "Segmentation")
            method = seg.get("multipleModelMethod")
            scores, weights = [], []
            for s in seg:
                if _strip(s.tag) != "Segment":
                    continue
                tm = next(e for e in s if _strip(e.tag) == "TreeModel")
                scores.append(walk_tree_model(tm))
                weights.append(float(s.get("weight", "1.0")))
            if method == "sum":
                return sum(w * v for w, v in zip(weights, scores))
            return sum(scores) / len(scores)
        if tag == "RegressionModel":
            table = next(e for e in child.iter() if _strip(e.tag) == "RegressionTable")
            s = float(table.get("intercept"))
            for p in table:
                if _strip(p.tag) == "NumericPredictor":
                    s += float(p.get("coefficient")) * row[p.get("name")]
            if child.get("normalizationMethod") == "logit":
                s = 1.0 / (1.0 + math.exp(-s))
            return s
        if tag == "NeuralNetwork":
            values: dict[str, float] = {}
            for ni in child.iter():
                if _strip(ni.tag) == "NeuralInput":
                    field = next(e for e in ni.iter() if _strip(e.tag) == "FieldRef").get("field")
                    values[ni.get("id")] = row[field]
            for layer in child:
                if _strip(layer.tag) != "NeuralLayer":
                    continue
                act = layer.get("activationFunction") or child.get("activationFunction")
                new_vals = {}
                for neuron in layer:
                    s = float(neuron.get("bias"))
                    for con in neuron:
                        s += float(con.get("weight")) * values[con.get("from")]
                    if act == "logistic":
                        s = 1.0 / (1.0 + math.exp(-s))
                    elif act == "tanh":
                        s = math.tanh(s)
                    elif act == "rectifier":
                        s = max(0.0, s)
                    new_vals[neuron.get("id")] = s
                values.update(new_vals)
            out = next(e for e in child.iter() if _strip(e.tag) == "NeuralOutput")
            return values[out.get("outputNeuron")]
    raise ValueError("no supported model element found")
