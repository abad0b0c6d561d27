"""Public test-support helpers, mirroring the reference's
``tmlt/core/utils/testing.py`` surface (reference lines cited per
helper) so downstream test suites can switch without rewriting.

Spark-first re-expression: DataFrame comparison rides on
``pyspark.testing.assertDataFrameEqual`` where available, and the
statistical harness reuses this package's exact distribution CMFs.
"""

from __future__ import annotations

import math
import unittest
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union
from unittest.mock import Mock, create_autospec

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..base import Measurement, Transformation
from ..domains import (
    Domain,
    NumpyIntegerDomain,
    SparkDataFrameDomain,
    SparkFloatColumnDescriptor,
    SparkIntegerColumnDescriptor,
)
from ..exact_number import ExactNumber
from ..measures import PureDP
from ..metrics import AbsoluteDifference, Metric, SymmetricDifference

try:  # Spark >= 3.5
    from pyspark.testing import assertDataFrameEqual as _assert_sdf_equal
except ImportError:  # pragma: no cover
    _assert_sdf_equal = None


def _assert_pd_equal_with_sort(
    actual: pd.DataFrame, expected: pd.DataFrame
) -> None:
    """Order-insensitive pandas comparison (reference testing.py:71-97)."""
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"columns differ: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    cols = sorted(actual.columns)
    a = actual[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    e = expected[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, e, check_dtype=False)


def assert_dataframe_equal(
    actual: Union[DataFrame, pd.DataFrame],
    expected: Union[DataFrame, pd.DataFrame],
) -> None:
    """Row-order-insensitive DataFrame equality (reference
    testing.py:100-135): Spark pairs go through
    ``pyspark.testing.assertDataFrameEqual`` (null/NaN aware), mixed
    or pandas pairs through a sorted pandas comparison with
    ``check_dtype=False``."""
    if (
        _assert_sdf_equal is not None
        and isinstance(actual, DataFrame)
        and isinstance(expected, DataFrame)
    ):
        _assert_sdf_equal(actual, expected)
        return
    if isinstance(actual, DataFrame):
        actual = actual.toPandas()
    if isinstance(expected, DataFrame):
        expected = expected.toPandas()
    _assert_pd_equal_with_sort(actual, expected)


def pandas_to_spark_dataframe(
    spark: SparkSession,
    pdf: pd.DataFrame,
    domain: Optional[SparkDataFrameDomain] = None,
) -> DataFrame:
    """pandas -> Spark conversion that survives empty frames (reference
    testing.py:137-172): with a domain, the schema comes from the
    domain so a 0-row frame round-trips with correct types."""
    if domain is not None:
        return spark.createDataFrame(pdf, schema=domain.spark_schema)
    return spark.createDataFrame(pdf)


def get_all_props(component_type: type) -> List[Tuple[str]]:
    """Names of every property of a component class, as 1-tuples for
    parametrize (reference testing.py:175-187)."""
    return [
        (name,)
        for name in dir(component_type)
        if isinstance(getattr(component_type, name, None), property)
    ]


def assert_property_immutability(component: Any, prop_name: str) -> None:
    """Assert a property has no setter (reference testing.py:190-200
    checks mutation safety; components here expose read-only
    properties, so a settable property is the bug)."""
    prop = getattr(type(component), prop_name, None)
    assert isinstance(prop, property), f"{prop_name!r} is not a property"
    assert prop.fset is None, f"property {prop_name!r} is settable"


def create_mock_transformation(
    input_domain: Domain = NumpyIntegerDomain(),
    input_metric: Metric = AbsoluteDifference(),
    output_domain: Domain = NumpyIntegerDomain(),
    output_metric: Metric = AbsoluteDifference(),
    return_value: Any = 0,
    stability_function_implemented: bool = False,
    stability_function_return_value: Any = ExactNumber(1),
) -> Mock:
    """Autospec'd Transformation mock (reference testing.py:314-351)."""
    t = create_autospec(spec=Transformation, instance=True)
    t.input_domain = input_domain
    t.input_metric = input_metric
    t.output_domain = output_domain
    t.output_metric = output_metric
    t.return_value = return_value
    t.stability_function.return_value = stability_function_return_value
    if not stability_function_implemented:
        t.stability_function.side_effect = NotImplementedError("TEST")
    return t


def create_mock_measurement(
    input_domain: Domain = NumpyIntegerDomain(),
    input_metric: Metric = AbsoluteDifference(),
    output_measure=PureDP(),
    return_value: Any = 0,
    privacy_function_implemented: bool = False,
    privacy_function_return_value: Any = ExactNumber(1),
) -> Mock:
    """Autospec'd Measurement mock (reference testing.py:364-401)."""
    m = create_autospec(spec=Measurement, instance=True)
    m.input_domain = input_domain
    m.input_metric = input_metric
    m.output_measure = output_measure
    m.return_value = return_value
    m.privacy_function.return_value = privacy_function_return_value
    if not privacy_function_implemented:
        m.privacy_function.side_effect = NotImplementedError("TEST")
    return m


class PySparkTest(unittest.TestCase):
    """unittest base managing one shared local SparkSession (reference
    testing.py:430-515)."""

    spark: SparkSession

    @classmethod
    def setUpClass(cls) -> None:
        from .misc import get_spark

        cls.spark = get_spark(app_name="tcs-test", cpus=4)

    @classmethod
    def tearDownClass(cls) -> None:
        # the session is shared process-wide; do not stop it here so
        # multiple test classes can reuse the same JVM
        pass

    def assert_frame_equal_with_sort(self, actual, expected) -> None:
        assert_dataframe_equal(actual, expected)


@dataclass
class Case:
    """One named parametrize case (reference testing.py:553-618)."""

    name: str
    kwargs: Dict[str, Any] = field(default_factory=dict)

    def __init__(self, name: str, **kwargs: Any):
        self.name = name
        self.kwargs = kwargs


def parametrize(*cases: Case) -> Callable:
    """pytest-native expansion of :class:`Case` lists (reference
    testing.py:621-682 builds the same matrix for unittest)."""
    import pytest

    keys: List[str] = sorted({k for c in cases for k in c.kwargs})

    def missing(c: Case) -> List[str]:
        return [k for k in keys if k not in c.kwargs]

    bad = [(c.name, missing(c)) for c in cases if missing(c)]
    if bad:
        raise ValueError(f"cases missing keys: {bad}")
    return pytest.mark.parametrize(
        ",".join(keys),
        [
            pytest.param(*[c.kwargs[k] for k in keys], id=c.name)
            for c in cases
        ],
    )


@dataclass
class FixedGroupDataSet:
    """``num_groups`` identical groups of ``group_vals`` in columns
    (A: group index, B: measure) — the dataset shape the reference's
    noise-distribution system tests draw from (reference
    testing.py:685-747)."""

    group_vals: Sequence[Union[int, float]]
    num_groups: int
    float_measure_column: bool = False

    def __post_init__(self) -> None:
        spark = SparkSession.builder.getOrCreate()
        self.group_keys = spark.createDataFrame(
            [(i,) for i in range(self.num_groups)], schema="A long"
        )
        schema = "A long, B double" if self.float_measure_column else "A long, B long"
        self._dataframe = spark.createDataFrame(
            [
                (x, float(v) if self.float_measure_column else int(v))
                for x in range(self.num_groups)
                for v in self.group_vals
            ],
            schema=schema,
        )

    @property
    def domain(self) -> SparkDataFrameDomain:
        return SparkDataFrameDomain(
            {
                "A": SparkIntegerColumnDescriptor(size=64),
                "B": SparkFloatColumnDescriptor(size=64)
                if self.float_measure_column
                else SparkIntegerColumnDescriptor(size=64),
            }
        )

    def groupby(self, use_l2: bool = False):
        from ..transformations.groupby import GroupBy

        return GroupBy(
            self.domain, SymmetricDifference(), use_l2, self.group_keys
        )

    @property
    def lower(self) -> ExactNumber:
        return ExactNumber.from_float(min(self.group_vals), round_up=False)

    @property
    def upper(self) -> ExactNumber:
        return ExactNumber.from_float(max(self.group_vals), round_up=True)

    def get_dataframe(self) -> DataFrame:
        return self._dataframe


def ks_pvalue(samples: Sequence[float], cdf: Callable[[Any], Any]) -> float:
    """One-sample Kolmogorov-Smirnov p-value against an analytic CDF
    (asymptotic Kolmogorov distribution; no scipy in this
    environment)."""
    x = np.sort(np.asarray(samples, dtype=float))
    n = len(x)
    c = np.asarray(np.vectorize(cdf)(x), dtype=float)
    d = max(
        float(np.max(np.arange(1, n + 1) / n - c)),
        float(np.max(c - np.arange(0, n) / n)),
    )
    t = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d
    s = sum(
        (-1) ** (k - 1) * math.exp(-2 * k * k * t * t) for k in range(1, 101)
    )
    return max(0.0, min(1.0, 2 * s))


def run_test_using_ks_test(
    samples: Sequence[float],
    cdf: Callable[[float], float],
    p_threshold: float = 0.05,
) -> None:
    """One-sample Kolmogorov-Smirnov goodness-of-fit against an
    analytic CDF (reference testing.py:916-934).  Asserts the p-value
    exceeds ``p_threshold``."""
    p = ks_pvalue(samples, cdf)
    assert p > p_threshold, f"KS test failed: p={p} <= {p_threshold}"


def chi_squared_pvalue(
    observed: np.ndarray, expected: np.ndarray
) -> float:
    """Chi-squared tail p-value over bins with expected count > 5
    (Wilson-Hilferty approximation; no scipy in this environment)."""
    observed = np.asarray(observed, dtype=float)
    expected = np.asarray(expected, dtype=float)
    mask = expected > 5
    dof = int(mask.sum()) - 1
    if dof <= 0:
        return 1.0
    stat = float(((observed[mask] - expected[mask]) ** 2 / expected[mask]).sum())
    z = ((stat / dof) ** (1 / 3) - (1 - 2 / (9 * dof))) / math.sqrt(2 / (9 * dof))
    return 0.5 * math.erfc(z / math.sqrt(2))


def run_test_using_chi_squared_test(
    samples: Sequence[int],
    pmf: Callable[[int], float],
    p_threshold: float = 0.05,
) -> None:
    """Chi-squared goodness-of-fit of integer samples against an
    analytic PMF (reference testing.py:936-956): observed counts over
    the sample's support vs expected counts (bins with expected <= 5
    ignored, matching the reference's pooling intent)."""
    samples = list(samples)
    n = len(samples)
    lo, hi = min(samples), max(samples)
    support = list(range(lo, hi + 1))
    expected = np.array([pmf(k) for k in support], dtype=float) * n
    counts = np.zeros(len(support))
    for s in samples:
        counts[s - lo] += 1
    p = chi_squared_pvalue(counts, expected)
    assert p > p_threshold, f"chi-squared test failed: p={p} <= {p_threshold}"
