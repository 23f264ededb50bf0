"""Distributed NN (MLP) training with Shifu's activation/optimizer set.

Reference: core/dtrain/nn/NNMaster.java:72-300 (master averages worker
gradients, applies optimizer, broadcasts weights), AbstractNNWorker.java:521-620
(workers compute gradients on local float datasets, dropout, fixed-layer
fine-tune), activations ActivationReLU/LeakyReLU/PTANH/Swish (plus Encog's
sigmoid/tanh/linear):
  - ActivationPTANH.java:52-81  — tanh(x) for x>0 else 0.25*tanh(x);
    derivative 1-a^2 for x>0 else 0.25*(1-16*a^2)
  - ActivationSwish.java:51-74  — x*sigmoid(x); derivative s + x*s*(1-s)
  - ActivationLeakyReLU.java:61-110 — x<=thr -> alpha*x (default thr=0,
    alpha=0.01); derivative alpha / 1
MLlib's MultilayerPerceptronClassifier only offers sigmoid hidden layers, so
this closes the activation-parity gap (SURVEY §2.10) with the same
aggregate-broadcast superstep as ml/sgd.py:

  workers = ``mapInPandas`` backprop partials (Arrow-batched numpy; one
            (flat-gradient, loss, n) row per TASK);
  fan-in  = partials fold IN SPARK via ``treeAggregate``
            (sgd.fold_gradient_partials) — driver traffic is ONE summed
            row of O(weight-count), independent of both row and batch
            count; the driver applies the Weight.java optimizer
            (BGD/MOMENTUM/ADAGRAD/RMSPROP/ADAM from ml/sgd.py);
  next epoch's closure carries the new weights (broadcast-by-closure).

Scale notes: input is cached once and re-read per epoch; each epoch is one
Spark job with partial aggregation, so the pattern survives a 1000-executor
cluster — the only driver-side state is the weight vector itself (as in the
reference, where the Guagua master holds exactly that).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shifu_spark.ml.sgd import (
    OPTIMIZERS,
    ConvergeEarlyStop,
    WindowEarlyStop,
    fold_gradient_partials,
    mixed_sample_seed,
    run_epoch_loop,
)

# ---------------------------------------------------------------------------
# Activations — forward(z) -> a and backward(z, a) -> da/dz, vectorized.
# Formulas match the reference files cited in the module docstring.
# ---------------------------------------------------------------------------


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))


ACTIVATIONS: dict[str, tuple] = {
    "SIGMOID": (_sigmoid, lambda z, a: a * (1.0 - a)),
    "TANH": (np.tanh, lambda z, a: 1.0 - a * a),
    "LINEAR": (lambda z: z, lambda z, a: np.ones_like(z)),
    "RELU": (lambda z: np.maximum(z, 0.0), lambda z, a: (z > 0).astype(np.float64)),
    "LEAKY_RELU": (
        lambda z: np.where(z <= 0.0, 0.01 * z, z),
        lambda z, a: np.where(z <= 0.0, 0.01, 1.0),
    ),
    "PTANH": (
        lambda z: np.where(z > 0.0, np.tanh(z), 0.25 * np.tanh(z)),
        lambda z, a: np.where(z > 0.0, 1.0 - a * a, 0.25 * (1.0 - 16.0 * a * a)),
    ),
    "SWISH": (
        lambda z: z * _sigmoid(z),
        lambda z, a: _sigmoid(z) + z * _sigmoid(z) * (1.0 - _sigmoid(z)),
    ),
}


# ---------------------------------------------------------------------------
# Weight layout — one flat vector (the master's broadcast unit)
# ---------------------------------------------------------------------------


def _shapes(layers: list[int]) -> list[tuple[int, int]]:
    """[(fan_in+1, fan_out)] per layer; +1 row is the bias."""
    return [(layers[i] + 1, layers[i + 1]) for i in range(len(layers) - 1)]


def _unflatten(w: np.ndarray, layers: list[int]) -> list[np.ndarray]:
    out, off = [], 0
    for rows, cols in _shapes(layers):
        out.append(w[off : off + rows * cols].reshape(rows, cols))
        off += rows * cols
    return out


def _forward(x: np.ndarray, mats: list[np.ndarray], acts: list[str]):
    """Returns (zs, as_) per layer; as_[-1] is the sigmoid output prob."""
    zs, as_ = [], [x]
    a = x
    for i, m in enumerate(mats):
        z = a @ m[:-1] + m[-1]
        fwd, _ = ACTIVATIONS[acts[i]]
        a = fwd(z)
        zs.append(z)
        as_.append(a)
    return zs, as_


def _backprop(x, y, mats, acts, dropout_masks=None):
    """Batch backprop for binary log-loss. Output layer activation must be
    SIGMOID (the reference's output layer is sigmoid for binary targets),
    which cancels to delta = p - y. Inverted dropout (AbstractNNWorker
    dropoutRate) masks hidden activations: the masked value feeds the next
    layer, the unmasked one feeds the activation derivative.
    Returns (grads per layer, loss)."""
    zs, raw, a_in = [], [], [x]  # a_in[i] = (masked) input to layer i
    a = x
    for i, m in enumerate(mats):
        z = a @ m[:-1] + m[-1]
        fwd, _ = ACTIVATIONS[acts[i]]
        a_raw = fwd(z)
        a = a_raw
        if dropout_masks is not None and i < len(mats) - 1:
            a = a_raw * dropout_masks[i]
        zs.append(z)
        raw.append(a_raw)
        a_in.append(a)
    p = a_in[-1][:, 0]
    eps = 1e-12
    loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
    delta = (p - y)[:, None]  # sigmoid + log-loss cancellation
    grads: list[np.ndarray] = [None] * len(mats)
    for i in range(len(mats) - 1, -1, -1):
        g = np.empty_like(mats[i])
        g[:-1] = a_in[i].T @ delta
        g[-1] = delta.sum(axis=0)
        grads[i] = g
        if i > 0:
            delta = delta @ mats[i][:-1].T
            _, bwd = ACTIVATIONS[acts[i - 1]]
            delta = delta * bwd(zs[i - 1], raw[i - 1])
            if dropout_masks is not None:
                delta = delta * dropout_masks[i - 1]
    return grads, loss


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


@dataclass
class NNResult:
    weights: list[float]  # flat vector, _unflatten(layers) to read
    layers: list[int] = field(default_factory=list)
    activations: list[str] = field(default_factory=list)
    train_losses: list[float] = field(default_factory=list)
    valid_losses: list[float] = field(default_factory=list)
    epochs_run: int = 0
    stopped_early: bool = False


def _partial_grad_udf(
    feature_cols, label_col, w, layers, acts, dropout_rate, base_seed, epoch
):
    n_weights = sum(r * c for r, c in _shapes(layers))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        mats = _unflatten(np.asarray(w), layers)
        # per-partition seed component: without it every task draws the
        # SAME dropout masks at the same batch offset, biasing the
        # stochastics relative to the reference's independent per-worker
        # randomness. (base_seed, epoch, partitionId) — seed and epoch as
        # SEPARATE entries, a pre-summed seed+epoch collides across
        # bagged trainers wherever bag+epoch sums coincide — stays fully
        # deterministic for a fixed partitioning while decorrelating
        # tasks.
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        rng = np.random.default_rng((base_seed, epoch, pid))
        # per-TASK fold: batches accumulate in arrival order, one row out
        acc_g, acc_loss, acc_n = np.zeros(n_weights), 0.0, 0
        for pdf in batches:
            x = pdf[feature_cols].to_numpy(dtype=np.float64)
            y = pdf[label_col].to_numpy(dtype=np.float64)
            n = len(y)
            if n == 0:
                continue
            masks = None
            if dropout_rate > 0.0:
                keep = 1.0 - dropout_rate
                masks = [
                    (rng.random((n, layers[i + 1])) < keep) / keep
                    for i in range(len(layers) - 2)
                ]
            grads, loss = _backprop(x, y, mats, acts, masks)
            flat = np.concatenate([g.ravel() for g in grads])
            assert flat.size == n_weights
            acc_g = acc_g + flat
            acc_loss += loss
            acc_n += n
        if acc_n:
            yield pd.DataFrame({"grad": [acc_g.tolist()], "loss": [acc_loss], "n": [acc_n]})

    return fn


def _valid_loss_udf(feature_cols, label_col, w, layers, acts):
    """Forward-ONLY (loss, n) per task — validation never needs the
    gradient, so it must not pay the backward pass nor ship the
    O(weights) vector through the fan-in; the scalar pair aggregates
    with plain Catalyst partial agg. Identical loss value to the
    backprop path (same forward, same eps)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mats = _unflatten(np.asarray(w), layers)
        acc_loss, acc_n = 0.0, 0
        for pdf in batches:
            x = pdf[feature_cols].to_numpy(dtype=np.float64)
            y = pdf[label_col].to_numpy(dtype=np.float64)
            if len(y) == 0:
                continue
            _, as_ = _forward(x, mats, acts)
            p = as_[-1][:, 0]
            eps = 1e-12
            acc_loss += float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
            acc_n += len(y)
        if acc_n:
            yield pd.DataFrame({"loss": [acc_loss], "n": [acc_n]})

    return fn


def _epoch(df, feature_cols, label_col, w, layers, acts, dropout_rate, base_seed, epoch,
           sample_rate=1.0):
    # per-epoch stochastic subsample (AbstractNNWorker sampleRate) taken
    # SPARK-SIDE on the cached frame — rows the sample drops never pay
    # Arrow transfer or pandas conversion; fresh seed per epoch so every
    # superstep sees a different subset; seed derivation rationale lives
    # with mixed_sample_seed (sgd.py)
    if sample_rate < 1.0:
        df = df.sample(
            withReplacement=False, fraction=sample_rate,
            seed=mixed_sample_seed(base_seed, epoch),
        )
    schema = "grad array<double>, loss double, n long"
    parts = df.mapInPandas(
        _partial_grad_udf(
            feature_cols, label_col, w, layers, acts, dropout_rate, base_seed, epoch
        ),
        schema=schema,
    )
    # partials fold in Spark (treeAggregate) — one row reaches the driver
    return fold_gradient_partials(parts, w.size)


def train_nn(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    hidden_layers: list[int] = (8,),
    hidden_activation: str = "RELU",
    valid_df: DataFrame | None = None,
    optimizer: str = "ADAM",
    learning_rate: float = 0.05,
    max_epochs: int = 30,
    dropout_rate: float = 0.0,
    epoch_sample_rate: float = 1.0,
    fixed_layers: list[int] | None = None,
    early_stop: WindowEarlyStop | ConvergeEarlyStop | None = None,
    seed: int = 42,
) -> NNResult:
    """Full-batch distributed MLP for binary targets.

    ``hidden_activation`` is any ACTIVATIONS key (the reference set:
    SIGMOID/TANH/RELU/LEAKY_RELU/PTANH/SWISH/LINEAR); the output layer is
    always SIGMOID. ``fixed_layers`` zeroes those layer indices' gradients
    (fine-tune with frozen layers, AbstractNNWorker fixedLayers).
    ``epoch_sample_rate`` < 1 makes each epoch a stochastic subsample of
    every worker's rows (AbstractNNWorker sampleRate) — cheaper epochs,
    noisier gradients, fresh subset per epoch.
    """
    layers = [len(feature_cols), *list(hidden_layers), 1]
    acts = [hidden_activation] * len(hidden_layers) + ["SIGMOID"]
    rng = np.random.default_rng(seed)
    # Xavier-ish init, matching Encog's range-based randomization in spirit
    w = np.concatenate(
        [
            (rng.random(r * c) * 2.0 - 1.0) / np.sqrt(r)
            for r, c in _shapes(layers)
        ]
    )
    opt = OPTIMIZERS[optimizer](learning_rate)
    res = NNResult(weights=w.tolist(), layers=layers, activations=acts)
    frozen = set(fixed_layers or [])

    df = df.select(*feature_cols, label_col).persist()
    if valid_df is not None:
        valid_df = valid_df.select(*feature_cols, label_col).persist()
    try:
        vdf = valid_df

        def grad_fn(cur_w, epoch):
            g, train_loss, n = _epoch(
                df, feature_cols, label_col, cur_w, layers, acts, dropout_rate,
                seed, epoch, epoch_sample_rate,
            )
            if n and frozen:
                # zero frozen-layer gradients before the optimizer step
                # (pure function of g — same result as zeroing inline)
                off = 0
                for i, (r, c) in enumerate(_shapes(layers)):
                    if i in frozen:
                        g[off : off + r * c] = 0.0
                    off += r * c
            return g, train_loss, n

        def _valid(cur_w):
            # forward-only pass: scalar (loss, n) per task, Catalyst
            # partial agg — no backward, no O(weights) payload (same
            # rationale as wdl._valid_loss_udf)
            row = vdf.mapInPandas(
                _valid_loss_udf(feature_cols, label_col, cur_w, layers, acts),
                schema="loss double, n long",
            ).agg(F.sum("loss").alias("loss"), F.sum("n").alias("n")).collect()[0]
            n = int(row["n"] or 0)
            return (row["loss"] / n if n else 0.0), n

        # epoch k's validation job overlaps epoch k+1's gradient job;
        # bookkeeping identical to the sequential loop (sgd.run_epoch_loop)
        w = run_epoch_loop(
            w, opt, max_epochs, grad_fn, res,
            _valid if valid_df is not None else None, early_stop,
        )
    finally:
        df.unpersist()
        if valid_df is not None:
            valid_df.unpersist()
    res.weights = w.tolist()
    return res


def nn_score_udf(feature_cols: list[str], result: NNResult):
    """Vectorized scorer: pandas_udf over the fitted net (weights ride the
    closure — same broadcast-model pattern as EvalScoreUDF scoring)."""
    from pyspark.sql.functions import pandas_udf

    w = np.asarray(result.weights)
    layers, acts = list(result.layers), list(result.activations)

    @pandas_udf("double")
    def score(*cols: pd.Series) -> pd.Series:
        x = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        mats = _unflatten(w, layers)
        _, as_ = _forward(x, mats, acts)
        return pd.Series(as_[-1][:, 0])

    return score(*[F.col(c) for c in feature_cols])


def train_nn_bagged(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    bags: int = 3,
    bag_fraction: float = 0.8,
    seed: int = 42,
    **train_kwargs,
) -> list[NNResult]:
    """Bagging for the custom NN: one net per seeded resample
    (TrainModelProcessor.java:931-942 runs N parallel Guagua jobs; here
    the epochs-of-bag-b jobs simply queue on the same cluster). A passed
    ``early_stop`` is STATEFUL (best-so-far / last-loss), so each bag
    gets its own fresh copy — sharing one instance would let bag 0's
    final state stop bag 1 spuriously."""
    import copy

    nets = []
    for bag in range(bags):
        kw = dict(train_kwargs)
        if kw.get("early_stop") is not None:
            kw["early_stop"] = copy.deepcopy(kw["early_stop"])
        nets.append(
            train_nn(
                df.sample(withReplacement=False, fraction=bag_fraction, seed=seed + bag),
                feature_cols,
                label_col,
                seed=seed + bag,
                **kw,
            )
        )
    return nets


def score_nn_ensemble(
    df: DataFrame,
    feature_cols: list[str],
    results: list[NNResult],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Bagged-NN ensemble scoring: model0..N columns via the Arrow scorer
    (all nets ride pandas_udf closures — the broadcast-model pattern of
    EvalScoreUDF.java:237-247), then the shared mean/max/min/median
    array expressions (ScoreObject.java:35-74)."""
    from shifu_spark.ml.train import with_ensemble_stats

    out = df
    score_cols = []
    for i, r in enumerate(results):
        col = f"model{i}"
        out = out.withColumn(col, nn_score_udf(feature_cols, r))
        score_cols.append(col)
    return with_ensemble_stats(out, score_cols, keep_cols)
