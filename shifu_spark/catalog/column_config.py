"""The column catalog — the IR every operator reads/writes.

Mirrors the reference's two JSON artifacts (semantics, not code):
  * ModelConfig.json  -> reference container/obj/ModelConfig.java:65-95
  * ColumnConfig.json -> reference container/obj/ColumnConfig.java,
    ColumnStats.java:37-142, ColumnBinning.java:40-96

Every pipeline stage (init -> stats -> norm -> train -> eval) consumes the
catalog; stats rewrites it. In Spark the catalog is driver-side (columns
<< rows) and is broadcast into expression builders instead of the
reference's path-based distributed-cache reload
(udf/AbstractTrainerUDF.java:119).
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field
from enum import Enum
from typing import Any


class ColumnType(str, Enum):
    """reference container/obj/ColumnType.java:18-21 (A/N/C/H)."""

    AUTO = "A"
    NUMERICAL = "N"
    CATEGORICAL = "C"
    HYBRID = "H"


class ColumnFlag(str, Enum):
    """reference ColumnConfig.java:38-40; Weight treated as Meta (:210-214)."""

    FORCE_SELECT = "ForceSelect"
    FORCE_REMOVE = "ForceRemove"
    CANDIDATE = "Candidate"
    META = "Meta"
    TARGET = "Target"
    WEIGHT = "Weight"


@dataclass
class ColumnBinning:
    """reference container/obj/ColumnBinning.java:40-96.

    ``bin_boundary`` holds numeric left edges; element 0 is -inf by
    construction; bin i covers [b_i, b_{i+1}).  Lookup misses map to the
    dedicated *missing* slot appended as the LAST bin (reference
    Normalizer.java:579-596, BinUtils.java:53-104).
    """

    length: int = 0
    bin_boundary: list[float] = field(default_factory=list)
    bin_category: list[str] = field(default_factory=list)
    bin_count_neg: list[int] = field(default_factory=list)
    bin_count_pos: list[int] = field(default_factory=list)
    bin_pos_rate: list[float] = field(default_factory=list)
    bin_avg_score: list[float] = field(default_factory=list)
    bin_weighted_neg: list[float] = field(default_factory=list)
    bin_weighted_pos: list[float] = field(default_factory=list)
    bin_count_woe: list[float] = field(default_factory=list)
    bin_weighted_woe: list[float] = field(default_factory=list)


@dataclass
class ColumnStats:
    """reference container/obj/ColumnStats.java:37-142."""

    max: float | None = None
    min: float | None = None
    mean: float | None = None
    median: float | None = None
    p25th: float | None = None
    p75th: float | None = None
    total_count: int = 0
    distinct_count: int = 0
    missing_count: int = 0
    valid_num_count: int = 0
    std_dev: float | None = None
    missing_percentage: float | None = None
    woe: float | None = None
    ks: float | None = None
    iv: float | None = None
    weighted_ks: float | None = None
    weighted_iv: float | None = None
    weighted_woe: float | None = None
    skewness: float | None = None
    kurtosis: float | None = None
    psi: float | None = None
    unit_stats: list[str] = field(default_factory=list)


@dataclass
class ColumnConfig:
    """One physical column's catalog entry (reference ColumnConfig.java)."""

    column_num: int
    column_name: str
    column_type: ColumnType = ColumnType.AUTO
    column_flag: ColumnFlag | None = None
    final_select: bool = False
    hybrid_threshold: float | None = None
    column_stats: ColumnStats = field(default_factory=ColumnStats)
    column_binning: ColumnBinning = field(default_factory=ColumnBinning)

    # -- role helpers ------------------------------------------------------
    @property
    def is_target(self) -> bool:
        return self.column_flag == ColumnFlag.TARGET

    @property
    def is_meta(self) -> bool:
        return self.column_flag in (ColumnFlag.META, ColumnFlag.WEIGHT)

    @property
    def is_candidate(self) -> bool:
        return not self.is_target and not self.is_meta and self.column_flag != ColumnFlag.FORCE_REMOVE

    @property
    def is_numerical(self) -> bool:
        return self.column_type == ColumnType.NUMERICAL

    @property
    def is_categorical(self) -> bool:
        return self.column_type == ColumnType.CATEGORICAL

    @property
    def is_hybrid(self) -> bool:
        return self.column_type == ColumnType.HYBRID

    # -- woe-distribution constants (reference Normalizer.java:728-756) ----
    def woe_mean_std(self, weighted: bool = False) -> tuple[float, float]:
        """Mean/stddev of the woe-transformed population, from bin counts.

        Used by WOE_ZSCORE; reference calculateWoeMeanAndStdDev:728-756.
        """
        b = self.column_binning
        woes = b.bin_weighted_woe if weighted else b.bin_count_woe
        counts = [n + p for n, p in zip(b.bin_count_neg, b.bin_count_pos)]
        total = sum(counts)
        if total == 0 or not woes:
            return 0.0, 1.0
        mean = sum(w * c for w, c in zip(woes, counts)) / total
        var = sum(c * (w - mean) ** 2 for w, c in zip(woes, counts)) / total
        return mean, math.sqrt(var) if var > 0 else 1.0


@dataclass
class DataSetConf:
    """reference container/obj/ModelSourceDataConf / RawSourceData.java."""

    data_path: str = ""
    header_path: str | None = None
    data_delimiter: str = "|"
    header_delimiter: str = "|"
    target_column: str = ""
    weight_column: str | None = None
    pos_tags: list[str] = field(default_factory=list)
    neg_tags: list[str] = field(default_factory=list)
    missing_tokens: list[str] = field(default_factory=lambda: ["", "?"])
    meta_columns: list[str] = field(default_factory=list)
    categorical_columns: list[str] = field(default_factory=list)
    filter_expression: str | None = None


@dataclass
class StatsConf:
    """reference container/obj/ModelStatsConf.java."""

    max_num_bin: int = 10
    cate_max_num_bin: int = 0  # 0 = unlimited
    binning_method: str = "EqualPositive"  # reference ModelStatsConf.java:34-36
    binning_algorithm: str = "SPDTI"
    sample_rate: float = 1.0
    sample_negative_only: bool = False
    psi_column: str | None = None
    seed: int = 42


@dataclass
class NormalizeConf:
    """reference container/obj/ModelNormalizeConf.java."""

    norm_type: str = "ZSCALE"
    std_dev_cut_off: float = 6.0  # reference ModelNormalizeConf.java:71
    sample_rate: float = 1.0


@dataclass
class ModelConfig:
    """The pipeline spec (reference ModelConfig.java:65-95)."""

    name: str = "model"
    dataset: DataSetConf = field(default_factory=DataSetConf)
    stats: StatsConf = field(default_factory=StatsConf)
    normalize: NormalizeConf = field(default_factory=NormalizeConf)
    train: dict[str, Any] = field(default_factory=dict)
    evals: list[dict[str, Any]] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, text: str) -> "ModelConfig":
        d = json.loads(text)
        mc = cls(name=d.get("name", "model"))
        mc.dataset = DataSetConf(**d.get("dataset", {}))
        mc.stats = StatsConf(**d.get("stats", {}))
        mc.normalize = NormalizeConf(**d.get("normalize", {}))
        mc.train = d.get("train", {})
        mc.evals = d.get("evals", [])
        return mc


# ---------------------------------------------------------------------------
# JSON round-trip for the ColumnConfig list
# ---------------------------------------------------------------------------

def save_column_configs(configs: list[ColumnConfig], path: str) -> None:
    with open(path, "w") as f:
        json.dump([asdict(c) for c in configs], f, indent=2, default=str)


def load_column_configs(path: str) -> list[ColumnConfig]:
    with open(path) as f:
        raw = json.load(f)
    out: list[ColumnConfig] = []
    for d in raw:
        cc = ColumnConfig(column_num=d["column_num"], column_name=d["column_name"])
        cc.column_type = ColumnType(d.get("column_type", "A"))
        flag = d.get("column_flag")
        cc.column_flag = ColumnFlag(flag) if flag else None
        cc.final_select = bool(d.get("final_select", False))
        cc.hybrid_threshold = d.get("hybrid_threshold")
        cc.column_stats = ColumnStats(**{k: v for k, v in d.get("column_stats", {}).items()})
        cc.column_binning = ColumnBinning(**{k: v for k, v in d.get("column_binning", {}).items()})
        out.append(cc)
    return out
