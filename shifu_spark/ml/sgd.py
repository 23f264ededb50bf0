"""Distributed logistic-regression SGD with Shifu's optimizer + early-stop set.

Reference: core/dtrain/lr/LogisticRegressionWorker.java:302-340 (workers
accumulate sigmoid gradients over their local data), LogisticRegressionMaster
(averages + applies optimizer), core/dtrain/Weight.java:48-176 (optimizers
BGD / MOMENTUM / ADAGRAD / RMSPROP / ADAM), early stop
core/dtrain/earlystop/WindowEarlyStop.java and
ConvergeAndValidToleranceEarlyStop.java + core/ConvergeJudger.java.

Spark shape — the BSP superstep becomes one job per epoch:
  workers  = ``mapInPandas`` partial gradients (Arrow-batched numpy — one
             (grad, loss, n) row per TASK, no per-row Python);
  fan-in   = partials fold IN SPARK via ``treeAggregate``
             (fold_gradient_partials) so exactly one summed row reaches
             the driver, which applies the optimizer;
  broadcast = the new weight vector rides into the next epoch's closure.

This is exactly MLlib's own aggregate-broadcast iteration; we keep our own
epoch loop because MLlib exposes no generic early-stop callback (SURVEY
§2.10). Scales in features (gradient width) unlike a wide-agg formulation,
and in rows via partition parallelism. Cache the input once — every epoch
re-reads it.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Optimizers (Weight.java:48-176)
# ---------------------------------------------------------------------------


class Optimizer:
    """update(weights, grad) -> new weights. State lives on the driver —
    the master applies the optimizer, workers only compute gradients."""

    def __init__(self, learning_rate: float = 0.1):
        self.lr = learning_rate

    def update(self, w: np.ndarray, g: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class BGD(Optimizer):
    def update(self, w: np.ndarray, g: np.ndarray) -> np.ndarray:
        return w - self.lr * g


class Momentum(Optimizer):
    def __init__(self, learning_rate: float = 0.1, momentum: float = 0.9):
        super().__init__(learning_rate)
        self.momentum = momentum
        self.v: np.ndarray | None = None

    def update(self, w: np.ndarray, g: np.ndarray) -> np.ndarray:
        if self.v is None:
            self.v = np.zeros_like(w)
        self.v = self.momentum * self.v - self.lr * g
        return w + self.v


class AdaGrad(Optimizer):
    def __init__(self, learning_rate: float = 0.1, eps: float = 1e-8):
        super().__init__(learning_rate)
        self.eps = eps
        self.h: np.ndarray | None = None

    def update(self, w: np.ndarray, g: np.ndarray) -> np.ndarray:
        if self.h is None:
            self.h = np.zeros_like(w)
        self.h = self.h + g * g
        return w - self.lr * g / (np.sqrt(self.h) + self.eps)


class RMSProp(Optimizer):
    def __init__(self, learning_rate: float = 0.1, decay: float = 0.9, eps: float = 1e-8):
        super().__init__(learning_rate)
        self.decay = decay
        self.eps = eps
        self.h: np.ndarray | None = None

    def update(self, w: np.ndarray, g: np.ndarray) -> np.ndarray:
        if self.h is None:
            self.h = np.zeros_like(w)
        self.h = self.decay * self.h + (1 - self.decay) * g * g
        return w - self.lr * g / (np.sqrt(self.h) + self.eps)


class Adam(Optimizer):
    def __init__(self, learning_rate: float = 0.1, beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8):
        super().__init__(learning_rate)
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.m: np.ndarray | None = None
        self.v: np.ndarray | None = None
        self.t = 0

    def update(self, w: np.ndarray, g: np.ndarray) -> np.ndarray:
        if self.m is None:
            self.m = np.zeros_like(w)
            self.v = np.zeros_like(w)
        self.t += 1
        self.m = self.beta1 * self.m + (1 - self.beta1) * g
        self.v = self.beta2 * self.v + (1 - self.beta2) * g * g
        mh = self.m / (1 - self.beta1**self.t)
        vh = self.v / (1 - self.beta2**self.t)
        return w - self.lr * mh / (np.sqrt(vh) + self.eps)


OPTIMIZERS = {"BGD": BGD, "MOMENTUM": Momentum, "ADAGRAD": AdaGrad, "RMSPROP": RMSProp, "ADAM": Adam}


# ---------------------------------------------------------------------------
# Early stopping (earlystop/WindowEarlyStop.java, ConvergeAndValidTolerance)
# ---------------------------------------------------------------------------


class WindowEarlyStop:
    """Stop when validation error hasn't improved for ``window`` epochs
    (WindowEarlyStop.java: ignoreValue buffer of size windowSize)."""

    def __init__(self, window: int = 5):
        self.window = window
        self.best = float("inf")
        self.since_best = 0

    def should_stop(self, valid_error: float) -> bool:
        if valid_error < self.best:
            self.best = valid_error
            self.since_best = 0
        else:
            self.since_best += 1
        return self.since_best >= self.window


class ConvergeEarlyStop:
    """Stop when |train_error − last| < threshold (ConvergeJudger.java
    semantics: consecutive-epoch loss delta under tolerance)."""

    def __init__(self, threshold: float = 1e-6):
        self.threshold = threshold
        self.last: float | None = None

    def should_stop(self, train_error: float) -> bool:
        prev, self.last = self.last, train_error
        return prev is not None and abs(prev - train_error) < self.threshold


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


@dataclass
class SGDResult:
    weights: list[float]  # [w_0..w_{d-1}, bias]
    train_losses: list[float] = field(default_factory=list)
    valid_losses: list[float] = field(default_factory=list)
    epochs_run: int = 0
    stopped_early: bool = False


def _partial_gradient_udf(feature_cols: list[str], label_col: str, weights: np.ndarray, reg: float):
    """ONE (gradient, loss, n) partial row per TASK — the 'worker' side.
    Arrow batches fold locally in arrival order (same summation order as
    per-batch rows folded downstream), so rows entering the
    treeAggregate fan-in = O(tasks), independent of batch count."""
    d = len(feature_cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_g, acc_loss, acc_n = np.zeros(d + 1), 0.0, 0
        for pdf in batches:
            x = pdf[feature_cols].to_numpy(dtype=np.float64)
            y = pdf[label_col].to_numpy(dtype=np.float64)
            n = len(y)
            if n == 0:
                continue
            z = x @ weights[:d] + weights[d]
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
            err = p - y
            grad_w = x.T @ err + reg * n * weights[:d]
            grad_b = float(err.sum())
            eps = 1e-12
            loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
            acc_g = acc_g + np.append(grad_w, grad_b)
            acc_loss += loss
            acc_n += n
        if acc_n:
            yield pd.DataFrame({"grad": [acc_g.tolist()], "loss": [acc_loss], "n": [acc_n]})

    return fn


def mixed_sample_seed(*entries: int) -> int:
    """31-bit Spark sample seed hash-mixed from integer seed entries.

    Shared by the NN and W&D trainers' per-epoch Spark-side subsampling.
    Mixing matters twice over: (a) bagged training draws bag b with
    ``df.sample(seed=seed+bag)`` and then trains with seed+bag, so a raw
    seed+epoch sample seed would share the bag sampler's Bernoulli
    stream at epoch 0 and bias the first epoch toward the bag's
    survivors; (b) the trainer's own seed and the epoch index must enter
    as SEPARATE entries — a pre-summed seed+epoch collides across bags
    wherever bag+epoch sums coincide ((b=0,e=1) vs (b=1,e=0)),
    correlating the bagged models' subsamples."""
    return int(np.random.default_rng((0x5A11, *entries)).integers(2**31 - 1))


def fold_gradient_partials(parts: DataFrame, width: int):
    """Sum (grad array<double>, loss double, n long) partial rows IN SPARK
    via RDD ``treeAggregate``: each task folds its local partial rows into
    one running numpy vector, combiners merge task results in a tree, and
    exactly ONE (grad, loss, n) triple reaches the driver — O(weights)
    driver traffic, independent of batch count.  Shared by the LR / NN /
    Wide&Deep trainers (the Guagua master fan-in, NNMaster.java:72-300 /
    WDLMaster.java, expressed as a tree-reduce).  This replaces both the
    driver-side collect()+sum (a fan-in of #batches x weight-vector — the
    W&D weight vector embeds whole embedding tables, so at 100 TB that
    collect was the scale-killer) and the earlier single-task
    ``collect_list`` fold (which materialized every batch gradient in one
    executor before folding).

    Returns (mean gradient, mean loss, n)."""

    def seq(acc, row):
        return (acc[0] + np.asarray(row["grad"]), acc[1] + row["loss"], acc[2] + row["n"])

    def comb(a, b):
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

    zero = (np.zeros(width), 0.0, 0)
    rdd = parts.rdd
    # depth 2 inserts a whole extra shuffle round purely to bound the
    # driver-side fan-in; with few partitions that fan-in is already
    # tiny (<= 64 partial rows of O(weights) each), so the extra stage
    # is pure per-epoch overhead — measured one full Spark stage per
    # epoch at sf0.1 (r12, guide §1.2: remove passes before tuning).
    # On a real cluster (hundreds+ of tasks) depth 2 keeps the fan-in
    # tree — the threshold adapts to the actual partition count, not a
    # local[32]-specific constant.
    depth = 1 if rdd.getNumPartitions() <= 64 else 2
    g, loss, n = rdd.treeAggregate(zero, seq, comb, depth=depth)
    if n == 0:
        # an empty epoch (Spark-side epoch_sample_rate can legitimately
        # draw zero rows from a small frame) must surface as the TRUE
        # n=0, not a sentinel (zeros, loss=0.0, n=1): a 0.0 loss looks
        # like perfect convergence to the early-stop watch —
        # WindowEarlyStop would latch it as best-so-far and
        # ConvergeEarlyStop would stop immediately. Callers skip the
        # optimizer step / loss append / watch when n == 0.
        return g, 0.0, 0
    return g / n, loss / n, n


def run_epoch_loop(
    w: np.ndarray,
    opt: Optimizer,
    max_epochs: int,
    grad_fn,
    record,
    valid_fn=None,
    early_stop=None,
) -> np.ndarray:
    """Shared trainer epoch driver (LR / NN / Wide&Deep) — overlaps
    epoch k's validation pass with epoch k+1's gradient pass.

    ``grad_fn(w, epoch) -> (g, mean_loss, n)`` runs one superstep at the
    given weights; ``valid_fn(w) -> (loss, n)`` is the forward-only
    validation watch; ``record`` carries the shared bookkeeping fields
    (train_losses / valid_losses / epochs_run / stopped_early).  Returns
    the final weight vector.

    Overlap (guide §2.6, VERDICT r12 item 4): epochs are inherently
    sequential (w_{k+1} needs g_k), but the validation job of epoch k
    only needs w_{k+1} — which epoch k+1's gradient job also reads and
    never mutates — so the two are independent Spark jobs and run
    concurrently from a 1-worker thread pool (inheritable_thread_target
    keeps job-group tagging deterministic).  The early-stopping read is
    guarded: epoch k's watch is resolved BEFORE epoch k+1's optimizer
    step, and a stop decision discards the speculative gradient without
    touching the record — train_losses / valid_losses / epochs_run /
    stopped_early and every early-stop state transition are identical
    to the sequential loop (the only cost of a stop is one wasted
    speculative pass).  ``valid_fn`` receives the weight vector as an
    argument at submit time, so the pool thread never races the main
    thread's weight update.  With no ``valid_fn`` the loop is purely
    sequential — nothing is submitted and no pool is created.
    """
    pool = None
    pending: tuple[float, object] | None = None  # (train_loss, future)

    def _resolve(p) -> bool:
        """Harvest the deferred valid result for the last stepped epoch;
        True = early stop fired (caller discards any speculative g)."""
        train_loss, fut = p
        vloss, vn = fut.result()
        watch = train_loss
        if vn > 0:
            record.valid_losses.append(vloss)
            watch = vloss
        if early_stop is not None and early_stop.should_stop(watch):
            record.stopped_early = True
            return True
        return False

    try:
        if valid_fn is not None:
            from concurrent.futures import ThreadPoolExecutor

            from pyspark import inheritable_thread_target
            from pyspark.sql import SparkSession

            pool = ThreadPoolExecutor(max_workers=1)
            # session form also inherits session tags (and avoids the
            # "Tags will not be inherited" warning under pinned threads)
            sess = SparkSession.getActiveSession()
            wrapped_valid = (
                inheritable_thread_target(sess)(valid_fn)
                if sess is not None
                else inheritable_thread_target(valid_fn)
            )
        for epoch in range(max_epochs):
            g, train_loss, n = grad_fn(w, epoch)
            if pending is not None:
                stopped = _resolve(pending)
                pending = None
                if stopped:
                    return w  # discard the speculative gradient
            if n == 0:
                # empty Spark-side epoch subsample: no step, no loss
                # record, no watch — a sentinel 0.0 loss would read as
                # perfect convergence and falsely latch the early stop
                record.epochs_run += 1
                continue
            w = opt.update(w, g)
            record.train_losses.append(train_loss)
            record.epochs_run += 1
            if valid_fn is None:
                if early_stop is not None and early_stop.should_stop(train_loss):
                    record.stopped_early = True
                    return w
            else:
                pending = (train_loss, pool.submit(wrapped_valid, w))
        if pending is not None:
            _resolve(pending)  # final epoch's valid loss + stop flag
    finally:
        if pool is not None:
            pool.shutdown(wait=True)
    return w


def _epoch(df: DataFrame, feature_cols: list[str], label_col: str, w: np.ndarray, reg: float):
    """Run one superstep: returns (summed gradient/n, mean loss, n)."""
    schema = "grad array<double>, loss double, n long"
    parts = df.mapInPandas(_partial_gradient_udf(feature_cols, label_col, w, reg), schema=schema)
    return fold_gradient_partials(parts, len(feature_cols) + 1)


def _lr_valid_loss(valid_df: DataFrame, feature_cols: list[str], label_col: str,
                   w: np.ndarray) -> tuple[float, int]:
    """Forward-only validation loss as a PURE column expression — scalar
    (loss, n) under Catalyst partial agg, no backward pass, no O(d)
    gradient payload per task (same rationale as nn._valid_loss_udf /
    wdl._valid_loss_udf: the watch metric never needs a gradient; here
    the LR forward is simple enough to skip Python entirely).  Mirrors
    the UDF formulas: z clipped to ±35, loss = −[y·log(p+ε)+(1−y)·
    log(1−p+ε)], ε = 1e-12."""
    d = len(feature_cols)
    z = F.lit(float(w[d]))
    for i, c in enumerate(feature_cols):
        z = z + F.col(c).cast("double") * float(w[i])
    z = F.greatest(F.least(z, F.lit(35.0)), F.lit(-35.0))
    p = 1.0 / (1.0 + F.exp(-z))
    y = F.col(label_col).cast("double")
    eps = 1e-12
    loss = -(y * F.log(p + eps) + (1.0 - y) * F.log(1.0 - p + eps))
    row = valid_df.agg(
        F.sum(loss).alias("loss"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n = int(row["n"] or 0)
    return (float(row["loss"]) / n if n else 0.0), n


def train_lr_sgd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    valid_df: DataFrame | None = None,
    optimizer: str = "ADAM",
    learning_rate: float = 0.1,
    max_epochs: int = 50,
    reg: float = 0.0,
    early_stop: WindowEarlyStop | ConvergeEarlyStop | None = None,
    seed: int = 42,
) -> SGDResult:
    """Full-batch distributed LR with pluggable optimizer + early stop.

    ``df`` is cached for the duration of the loop (every epoch re-reads).
    Validation loss (when ``valid_df`` given) feeds WindowEarlyStop the way
    the reference feeds validation error to the master.
    """
    rng = np.random.default_rng(seed)
    d = len(feature_cols)
    w = rng.normal(0.0, 0.01, d + 1)
    opt = OPTIMIZERS[optimizer](learning_rate)
    res = SGDResult(weights=w.tolist())

    df = df.select(*feature_cols, label_col).persist()
    if valid_df is not None:
        valid_df = valid_df.select(*feature_cols, label_col).persist()
    try:
        vdf = valid_df

        def grad_fn(cur_w, _epoch_idx):
            return _epoch(df, feature_cols, label_col, cur_w, reg)

        valid_fn = (
            (lambda cur_w: _lr_valid_loss(vdf, feature_cols, label_col, cur_w))
            if valid_df is not None
            else None
        )
        # epoch k's validation job overlaps epoch k+1's gradient job;
        # bookkeeping identical to the sequential loop (run_epoch_loop)
        w = run_epoch_loop(w, opt, max_epochs, grad_fn, res, valid_fn, early_stop)
    finally:
        df.unpersist()
        if valid_df is not None:
            valid_df.unpersist()
    res.weights = w.tolist()
    return res


def lr_score_expr(feature_cols: list[str], weights: list[float]):
    """sigmoid(w·x + b) as a pure column expression (broadcast weights)."""
    z = F.lit(float(weights[len(feature_cols)]))
    for i, c in enumerate(feature_cols):
        z = z + F.col(c).cast("double") * float(weights[i])
    return 1.0 / (1.0 + F.exp(-z))
