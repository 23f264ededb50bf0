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
    scale) before hashing.

    A nested field key (``s.d``) is resolved through ``df.select`` so a
    struct's double field cannot bypass the guard (a top-level-only
    dtypes lookup silently no-op'd on it — r10 review pass 2), and a
    misspelled key fails HERE at analysis instead of deep in the hash
    plan."""
    dtypes = dict(df.dtypes)
    if key_col in dtypes:
        dtype = dtypes[key_col]
    else:
        # nested/renamed reference: let Spark's analyzer resolve it (a
        # bad name raises AnalysisException right here — fail fast)
        dtype = df.select(key_col).schema.fields[0].dataType.simpleString()
    if dtype in ("float", "double"):
        raise ValueError(
            f"{what} {key_col!r} is {dtype}: cast(double AS string) is not "
            "cross-engine canonical — canonicalize to string/bigint/decimal first"
        )
