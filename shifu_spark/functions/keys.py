"""Cross-engine canonical hash keys.

Every content-keyed primitive in this engine (sketches, hash-Bernoulli
sampling, k-fold assignment, Poisson bootstrap copies) hashes
``md5(cast(key AS string))`` so the result is a pure function of the
data, identical across engines — which only holds when the STRING FORM
of the key is identical across engines. Floating-point keys break
this: Spark renders Java ``Double.toString`` ('1.50000005E7', 'NaN',
'Infinity') where DuckDB renders '15000000.5' / 'nan' / 'inf', so the
same value hashes into different buckets/samples per engine (r10
non-finite audit; finite doubles diverge too). String, integral and
decimal keys render identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def require_canonical_key(df: DataFrame, key_col: str, what: str = "key") -> None:
    """Raise loudly when ``key_col`` is FLOAT/DOUBLE — canonicalize
    upstream (cast to string/bigint, or format_number with a fixed
    scale) before hashing."""
    dtype = dict(df.dtypes).get(key_col)
    if dtype in ("float", "double"):
        raise ValueError(
            f"{what} {key_col!r} is {dtype}: cast(double AS string) is not "
            "cross-engine canonical — canonicalize to string/bigint/decimal first"
        )
