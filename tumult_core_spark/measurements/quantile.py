"""DP quantile via the exponential mechanism, vectorized per group.

Mechanism (reference ``pandas_measurements/series.py:90-484``): clip
values to [lower, upper], form the n+1 gap intervals between sorted
values, score interval i by ``-eps/2 * |i - q*n|`` (rank error), weight
by ``log(width) + score``, select with the Gumbel-max trick, return a
uniform sample within the winning interval.  All NumPy-vectorized per
group inside ``applyInPandas`` — the reference evaluates scores in an
Arb precision-doubling loop per value (float-path weakening documented
in ``samplers.py``).

Privacy: eps-DP per group; ``privacy_function(d) = eps * d`` under
SumOf / PureDP, ``(eps * d)^2 / 8`` under RootSumOfSquared / zCDP
(reference ``series.py:183-207``).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from .. import samplers
from ..base import Measurement
from ..domains import (
    PandasDataFrameDomain,
    SparkDataFrameDomain,
    SparkFloatColumnDescriptor,
    SparkGroupedDataFrameDomain,
)
from ..exact_number import ExactNumber, ExactNumberInput
from ..measures import Measure, PureDP, RhoZCDP
from ..metrics import (
    Metric,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)


class Aggregate(Measurement):
    """Base for per-group pandas DataFrame -> one-row DataFrame measurements."""

    output_spark_schema: T.StructType

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError


class NoisyQuantile(Aggregate):
    """Exponential-mechanism quantile of one column of a pandas DataFrame."""

    def __init__(
        self,
        measure_column: str,
        quantile: float,
        lower: float,
        upper: float,
        epsilon: ExactNumberInput,
        output_measure: Measure,
        output_column: Optional[str] = None,
    ):
        if not 0 <= quantile <= 1:
            raise ValueError("quantile must be in [0, 1]")
        if not lower < upper:
            raise ValueError("need lower < upper")
        if not isinstance(output_measure, (PureDP, RhoZCDP)):
            raise ValueError(f"Unsupported measure {output_measure!r}")
        self.epsilon = ExactNumber(epsilon)
        if self.epsilon < 0:
            raise ValueError("epsilon must be >= 0")
        self.measure_column = measure_column
        self.quantile = float(quantile)
        self.lower = float(lower)
        self.upper = float(upper)
        self.output_column = output_column or f"q{quantile}({measure_column})"
        self.output_spark_schema = T.StructType(
            [T.StructField(self.output_column, T.DoubleType(), False)]
        )
        super().__init__(
            PandasDataFrameDomain({}), SymmetricDifference(), output_measure
        )
        self._eps_float = (
            self.epsilon.to_float(round_up=False) if self.epsilon.is_finite else float("inf")
        )

    def privacy_function(self, d_in: Any) -> ExactNumber:
        d = ExactNumber(d_in)
        if d < 0:
            raise ValueError("d_in must be >= 0")
        if isinstance(self.output_measure, RhoZCDP):
            return (self.epsilon * d) ** 2 / 8
        return self.epsilon * d

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        values = pdf[self.measure_column].to_numpy(dtype=float) if len(pdf) else np.array([])
        return pd.DataFrame({self.output_column: [self._quantile(values)]})

    def _quantile(self, values: np.ndarray) -> float:
        lo, hi = self.lower, self.upper
        v = np.clip(values[~np.isnan(values)], lo, hi) if len(values) else values
        v = np.sort(v)
        n = len(v)
        edges = np.concatenate(([lo], v, [hi]))
        widths = np.diff(edges)  # n+1 intervals
        target = self.quantile * n
        ranks = np.arange(n + 1, dtype=float)
        eps = self._eps_float
        if np.isinf(eps):
            # degenerate: pick the interval containing the target rank
            idx = int(np.clip(np.floor(target), 0, n))
            if widths[idx] == 0:
                nz = np.nonzero(widths)[0]
                if len(nz) == 0:
                    return float(edges[0])
                idx = nz[np.argmin(np.abs(nz - target))]
        else:
            scores = -(eps / 2.0) * np.abs(ranks - target)
            with np.errstate(divide="ignore"):
                log_weights = np.log(widths) + scores
            gumbel = samplers.rng().gumbel(0.0, 1.0, n + 1)
            idx = int(np.argmax(log_weights + gumbel))
        return samplers.uniform(float(edges[idx]), float(edges[idx + 1]))


def create_quantile_measurement(
    input_domain: SparkDataFrameDomain,
    input_metric: Metric,
    output_measure: Measure,
    d_in: ExactNumberInput,
    d_out: ExactNumberInput,
    measure_column: str,
    quantile: float,
    lower: float,
    upper: float,
    groupby_transformation=None,
    quantile_column: Optional[str] = None,
) -> Measurement:
    """[GroupBy ->] per-group exponential-mechanism quantile.

    Ungrouped inputs are routed through a constant synthetic group so
    the data never leaves executors (the reference pulls ungrouped
    groups through ``toPandas``, ``grouped_dataframe.py:153-158``).
    """
    from ..base import ChainTM, ChainTT
    from ..transformations.groupby import GroupBy
    from .composition import PostProcess
    from .spark import ApplyInPandas

    d_in_e = ExactNumber(d_in)
    d_out_e = ExactNumber(d_out)
    quantile_column = quantile_column or f"q{quantile}({measure_column})"

    if groupby_transformation is None:
        from ..transformations.derive import DeriveColumn
        from ..domains import SparkIntegerColumnDescriptor
        from pyspark.sql import SparkSession, functions as F

        const = DeriveColumn(
            input_domain,
            input_metric,
            "__g",
            "0L",
            SparkIntegerColumnDescriptor(size=64),
        )
        spark = SparkSession.active()
        keys = spark.range(1).select(F.lit(0).cast("long").alias("__g"))
        gb = GroupBy(const.output_domain, input_metric, False, keys)
        pre = ChainTT(const, gb)

        def strip(df):
            row = df.select(F.col(f"`{quantile_column}`")).first()
            return np.float64(row[0])

        post_fn = strip
    else:
        gb = groupby_transformation
        if gb.input_domain != input_domain or gb.input_metric != input_metric:
            raise ValueError("groupby_transformation does not match input")
        pre = gb
        post_fn = None

    stability = pre.stability_function(d_in_e)
    if isinstance(output_measure, RhoZCDP):
        # (eps*d)^2/8 = rho  =>  eps = sqrt(8 rho)/d
        eps = (ExactNumber(8) * d_out_e).sqrt() / stability if stability > 0 else ExactNumber(0)
    else:
        eps = d_out_e / stability if stability > 0 else ExactNumber(0)

    agg = NoisyQuantile(
        measure_column,
        quantile,
        lower,
        upper,
        eps,
        output_measure,
        output_column=quantile_column,
    )
    m = ChainTM(pre, ApplyInPandas(pre.output_domain, pre.output_metric, agg))
    if post_fn is not None:
        m = PostProcess(m, post_fn)
    if not m.privacy_relation(d_in_e, d_out_e):
        raise AssertionError(
            f"quantile privacy {m.privacy_function(d_in_e)} > requested {d_out_e}"
        )
    return m
