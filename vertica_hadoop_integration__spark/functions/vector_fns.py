"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (zip_with/aggregate/transform), fully JVM-side and
codegen-friendly: no UDF, no Arrow hop, no python in the hot path.

Determinism note: the fold is sequential left-to-right in DOUBLE, which is
bitwise-identical to DuckDB's list_cosine_similarity over DOUBLE[] — so
similarity scores are oracle-checkable with exact equality (verified
empirically at build time).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine via a scalar pandas UDF — the sanctioned
    Python escape hatch (batched columnar transfer + numpy SIMD kernels,
    never row-at-a-time). For very wide embeddings the numpy matmul
    beats the interpreted higher-order-function fold; for 64-dim the
    JVM-side ``cosine`` above wins by skipping the Arrow hop. Kept as
    the template for scoring logic Catalyst can't express.

    Note: numpy's pairwise summation order differs from the sequential
    fold, so results agree to ~1e-12 but are not bitwise-identical —
    use ``cosine`` where oracle hash parity matters."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(xs, ys):
        A = np.stack(xs.to_numpy()).astype(np.float64)
        B = np.stack(ys.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    # real type objects, not strings: `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot resolve
    _cos.__annotations__ = {"xs": pd.Series, "ys": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double")(a, b)


def quantize_int8(a: Column) -> Column:
    """Symmetric absmax int8 quantization of one embedding: each value
    maps to floor(x * 127/absmax + 0.5) in [-127, 127] (explicit
    floor(+0.5) rounding — identical IEEE double ops on any engine,
    unlike round()'s per-engine tie rules). Returns array<int>; pair
    with ``quantize_scale`` to reconstruct (x ~ q * absmax/127).

    Shrinks a float32 embedding column 4x — at 100 TB of vectors that is
    the difference between an index that fits executor memory and one
    that spills. Map-only projection; computed in the scan stage."""
    absmax = F.aggregate(
        a, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.lit(127.0) / F.nullif(absmax, F.lit(0.0))
    # scale stays OUT of the per-element lambda (see normalize): pairing
    # against array_repeat evaluates the absmax fold once per row, not
    # once per element — identical doubles, O(d) instead of O(d^2)
    return F.zip_with(
        a,
        F.array_repeat(scale, F.size(a)),
        lambda x, s: F.coalesce(
            F.floor(x.cast("double") * s + F.lit(0.5)), F.lit(0)
        ).cast("int"),
    )


def quantize_scale(a: Column) -> Column:
    """The dequantization step size absmax/127 for ``quantize_int8``
    (0-vectors yield NULL scale and an all-zero quantized array)."""
    absmax = F.aggregate(
        a, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    return F.nullif(absmax, F.lit(0.0)) / F.lit(127.0)


def normalize(a: Column) -> Column:
    """Unit-normalize an embedding (array<double> out). Pre-normalizing the
    corpus once turns cosine top-k into dot-product top-k — at 100 TB the
    norm is computed in the same scan that writes the corpus, not per
    query.

    Shape note (r12, guide §1.2 per-task work): the norm must stay OUT
    of the per-element lambda — ``transform(a, x -> x / l2_norm(a))``
    re-evaluates the whole O(d) fold for every element (O(d^2)
    interpreted work per row; HOFs are CodegenFallback), which measured
    ~1s for one normalize pass over the sf0.1 embeddings.  Pairing the
    array against ``array_repeat(norm, size)`` evaluates the fold once
    per row and makes the lambda a single division — identical doubles
    (same x / n arithmetic), ~30x less expression evaluation."""
    n = l2_norm(a)
    return F.zip_with(
        a, F.array_repeat(n, F.size(a)), lambda x, y: x.cast("double") / y
    )
