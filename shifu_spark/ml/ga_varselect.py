"""GA wrapper variable selection (core/dvarsel) — Spark-first.

Reference: core/dvarsel/wrapper/CandidateGenerator.java (population of
fixed-size feature-subset "seeds"; each generation sorts by validation
error, keeps the best ``100-hybrid-mutation`` percent unchanged
[inherit()], crossovers the middle band [hybrid(): union of two parents'
genes, random father-sized subset], and re-randomizes the worst band
[mutate()]), CandidatePerf.java (seed id + validation error),
wrapper/ValidationConductor.java (fitness = train a model on the subset,
error on the validation split). Params population_multiply_cnt /
population_live_size / expect_variable_cnt / hybrid_percent /
mutation_percent keep their reference names.

Spark-first fitness: the reference trains one NN per candidate per
iteration over the data. At 100 TB that is population × generations full
passes. Instead we take TWO passes total: one over train, one over
validation, each computing the Gram matrix G = Zᵀ Z for Z = [X | 1 | y]
(mapInPandas partial outer-products, merged on the driver — O(d²) per
partition row-batch, d = candidate feature pool, catalog-sized). Every
candidate's fitness is then a closed-form linear-probe validation MSE
solved from sub-blocks of G on the driver:

    β = (G_ss + λI)⁻¹ g_sy        (normal equations on subset s)
    mse_valid = (yᵀy − 2 βᵀ g'_sy + βᵀ G'_ss β) / n'

so the GA loop itself touches no data. The linear probe replaces the
reference's per-candidate NN as the wrapper fitness (documented
difference; the *selection mechanics* are unchanged). Seeded RNG
replaces the reference's unseeded ``new Random()`` for testability
(SURVEY §7 determinism rule).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def gram_matrix(df: DataFrame, feature_cols: list[str], label_col: str) -> tuple[np.ndarray, int]:
    """One pass: G = Zᵀ Z with Z = [features | 1 | label]. Returns (G, n).

    Partial Gram per Arrow batch, summed on the driver — traffic is
    O(partitions · d²), independent of row count."""
    d = len(feature_cols)
    size = d + 2

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((size, size))
        n = 0
        for pdf in batches:
            x = pdf[feature_cols].to_numpy(dtype=np.float64)
            y = pdf[label_col].to_numpy(dtype=np.float64)
            z = np.column_stack([x, np.ones(len(y)), y])
            if not np.isfinite(z).all():
                # one NULL/NaN/Inf row would poison the WHOLE Gram and
                # every candidate's fitness would rank on NaN — a silent
                # wrong answer, not a crash. This operator deliberately
                # consumes NORMALIZED data (the z-score step mean-imputes
                # non-values upstream); fail loudly per SCALE.md
                # principle 6 instead of skewing the selection.
                raise ValueError(
                    "non-finite feature/label value reached the Gram pass — "
                    "normalize/mean-impute upstream of ga_varselect"
                )
            acc += z.T @ z
            n += len(y)
        yield pd.DataFrame({"gram": [acc.ravel().tolist()], "n": [n]})

    parts = df.select(*feature_cols, label_col).mapInPandas(
        fn, schema="gram array<double>, n long"
    ).collect()
    g = np.zeros((size, size))
    n = 0
    for row in parts:
        g += np.asarray(row["gram"]).reshape(size, size)
        n += row["n"]
    return g, n


def subset_valid_mse(
    g_train: np.ndarray, g_valid: np.ndarray, n_valid: int, subset: list[int], ridge: float = 1e-8
) -> float:
    """Linear-probe validation MSE for a feature subset, from Gram blocks.

    Index layout of G: [0..d-1]=features, d=intercept, d+1=label."""
    d = g_train.shape[0] - 2
    idx = [*subset, d]  # features + intercept
    a = g_train[np.ix_(idx, idx)] + ridge * np.eye(len(idx))
    b = g_train[idx, d + 1]
    beta = np.linalg.solve(a, b)
    yy = g_valid[d + 1, d + 1]
    gxy = g_valid[idx, d + 1]
    gxx = g_valid[np.ix_(idx, idx)]
    return float((yy - 2 * beta @ gxy + beta @ gxx @ beta) / max(n_valid, 1))


@dataclass
class GAResult:
    best_subset: list[int]  # indices into feature_cols
    best_features: list[str]
    best_error: float
    history: list[float] = field(default_factory=list)  # best error per generation


class CandidateGenerator:
    """Selection mechanics of CandidateGenerator.java, seeded.

    Band boundaries mirror getLastBestIndex/getFistWorstIndex:
    inherit = first n·inherit%/100 seeds, mutate = last n·mutation%/100,
    hybrid = the band between."""

    def __init__(
        self,
        variables: list[int],
        expect_variable_cnt: int,
        population_live_size: int,
        hybrid_percent: int = 60,
        mutation_percent: int = 20,
        seed: int = 42,
    ):
        if population_live_size < 1:
            raise ValueError("population_live_size must be >= 1")
        if not 1 <= expect_variable_cnt <= len(variables):
            raise ValueError("expect_variable_cnt out of range")
        self.variables = list(variables)
        self.k = expect_variable_cnt
        self.n = population_live_size
        self.cross_pct = hybrid_percent
        self.mut_pct = mutation_percent
        self.inherit_pct = 100 - hybrid_percent - mutation_percent
        if not 0 <= self.inherit_pct <= 100:
            raise ValueError("hybrid_percent + mutation_percent must be <= 100")
        self.rng = np.random.default_rng(seed)

    def _random_seed(self) -> tuple[int, ...]:
        return tuple(sorted(self.rng.choice(self.variables, size=self.k, replace=False).tolist()))

    def init_seeds(self) -> list[tuple[int, ...]]:
        return [self._random_seed() for _ in range(self.n)]

    def _hybrid(self, father: tuple[int, ...], mother: tuple[int, ...]) -> tuple[int, ...]:
        gene_pool = sorted(set(father) | set(mother))
        pick = self.rng.choice(len(gene_pool), size=len(father), replace=False)
        return tuple(sorted(gene_pool[i] for i in pick))

    def next_generation(self, ranked: list[tuple[tuple[int, ...], float]]) -> list[tuple[int, ...]]:
        """ranked = [(seed, verror)] sorted ascending by verror."""
        n = len(ranked)
        last_best = n * self.inherit_pct // 100
        # REFERENCE-FAITHFUL band arithmetic (CandidateGenerator.java:
        # 156-162): getFistWorstIndex = n*(100 - crossPercent)/100 — note
        # this makes the MUTATE band n*cross%/100 wide and the hybrid
        # band n*(100-cross-inherit)%/100, i.e. with the 60/20 defaults
        # MOST seeds re-randomize and few cross over. That skew is the
        # reference's own formula (arguably its bug — 100-mutation%
        # would give the documented 60% crossover), kept verbatim for
        # parity; the +1 inherit extra below mirrors subList(0, last+1).
        first_worst = n * (100 - self.cross_pct) // 100
        best = [s for s, _ in ranked[: last_best + 1]]
        ordinary = [s for s, _ in ranked[last_best + 1 : first_worst]]
        worst_cnt = n - len(best) - len(ordinary)
        out = list(best)
        for _ in range(len(ordinary)):
            f = ordinary[self.rng.integers(len(ordinary))]
            m = ordinary[self.rng.integers(len(ordinary))]
            out.append(self._hybrid(f, m))
        for _ in range(worst_cnt):
            out.append(self._random_seed())  # mutate() re-randomizes
        return out[: self.n]


def ga_varselect(
    train_df: DataFrame,
    valid_df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    expect_variable_cnt: int = 5,
    population_live_size: int = 20,
    population_multiply_cnt: int = 10,
    hybrid_percent: int = 60,
    mutation_percent: int = 20,
    seed: int = 42,
) -> GAResult:
    """Run the GA wrapper selection. Two Spark jobs total (train + valid
    Gram); generations iterate on the driver."""
    g_tr, _ = gram_matrix(train_df, feature_cols, label_col)
    g_va, n_va = gram_matrix(valid_df, feature_cols, label_col)

    gen = CandidateGenerator(
        list(range(len(feature_cols))),
        expect_variable_cnt,
        population_live_size,
        hybrid_percent,
        mutation_percent,
        seed,
    )
    seeds = gen.init_seeds()
    res = GAResult(best_subset=[], best_features=[], best_error=float("inf"))
    cache: dict[tuple[int, ...], float] = {}
    for _ in range(population_multiply_cnt):
        # explicit membership check: setdefault(s, solve(...)) evaluates
        # the O(k^3) solve EAGERLY even on cache hits — the memo would
        # never skip any work
        for s in seeds:
            if s not in cache:
                cache[s] = subset_valid_mse(g_tr, g_va, n_va, list(s))
        ranked = sorted(((s, cache[s]) for s in seeds), key=lambda p: p[1])
        top_seed, top_err = ranked[0]
        res.history.append(top_err)
        if top_err < res.best_error:
            res.best_error = top_err
            res.best_subset = list(top_seed)
        seeds = gen.next_generation(ranked)
    res.best_features = [feature_cols[i] for i in res.best_subset]
    return res
