from shifu_spark.catalog.column_config import (  # noqa: F401
    ColumnBinning,
    ColumnConfig,
    ColumnFlag,
    ColumnStats,
    ColumnType,
    DataSetConf,
    ModelConfig,
    NormalizeConf,
    StatsConf,
    load_column_configs,
    save_column_configs,
)
