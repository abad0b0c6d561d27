"""Component kernel: Transformation and Measurement base classes.

Every component is typed by (input_domain, input_metric) and either an
(output_domain, output_metric) pair — deterministic *transformations* —
or an output_measure — randomized *measurements*.  Privacy is verified
compositionally: ``ChainTM.privacy_function(d) =
M.privacy_function(T.stability_function(d))``.

Mirrors the contract of the reference's component bases
(``tmlt/core/transformations/base.py:18``,
``tmlt/core/measurements/base.py:15``,
``transformations/chaining.py:14``, ``measurements/chaining.py:15``)
re-expressed over lazy PySpark DataFrames: a chain of transformations
emits one fused Spark plan that Catalyst optimizes end-to-end; nothing
is materialized until a measurement boundary.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from .domains import Domain
from .exact_number import ExactNumber
from .measures import Measure
from .metrics import Metric


class Component(ABC):
    """Shared typing for transformations and measurements."""

    def __init__(self, input_domain: Domain, input_metric: Metric):
        self._input_domain = input_domain
        self._input_metric = input_metric

    @property
    def input_domain(self) -> Domain:
        return self._input_domain

    @property
    def input_metric(self) -> Metric:
        return self._input_metric


class Transformation(Component):
    """A deterministic dataset -> dataset component with bounded stability."""

    def __init__(
        self,
        input_domain: Domain,
        input_metric: Metric,
        output_domain: Domain,
        output_metric: Metric,
    ):
        super().__init__(input_domain, input_metric)
        self._output_domain = output_domain
        self._output_metric = output_metric

    @property
    def output_domain(self) -> Domain:
        return self._output_domain

    @property
    def output_metric(self) -> Metric:
        return self._output_metric

    @abstractmethod
    def stability_function(self, d_in: Any) -> Any:
        """Smallest d_out such that close inputs map to close outputs."""

    def stability_relation(self, d_in: Any, d_out: Any) -> bool:
        return self._output_metric.compare(self.stability_function(d_in), d_out)

    @abstractmethod
    def __call__(self, data: Any) -> Any:
        """Apply the transformation (lazy where the carrier is a DataFrame)."""

    def __or__(self, other: "Component") -> "Component":
        if isinstance(other, Measurement):
            return ChainTM(self, other)
        if isinstance(other, Transformation):
            return ChainTT(self, other)
        return NotImplemented


class Measurement(Component):
    """A randomized dataset -> output component with a privacy guarantee."""

    def __init__(
        self,
        input_domain: Domain,
        input_metric: Metric,
        output_measure: Measure,
        is_interactive: bool = False,
    ):
        super().__init__(input_domain, input_metric)
        self._output_measure = output_measure
        self._is_interactive = is_interactive

    @property
    def output_measure(self) -> Measure:
        return self._output_measure

    @property
    def is_interactive(self) -> bool:
        return self._is_interactive

    @abstractmethod
    def privacy_function(self, d_in: Any) -> Any:
        """Privacy loss guaranteed for inputs at distance ``d_in``."""

    def privacy_relation(self, d_in: Any, d_out: Any) -> bool:
        return self._output_measure.compare(self.privacy_function(d_in), d_out)

    @abstractmethod
    def __call__(self, data: Any) -> Any:
        """Run the measurement.  Randomness must be sampled exactly once."""


class ChainTT(Transformation):
    """Sequential composition of two transformations (``t1 | t2``)."""

    def __init__(self, transformation1: Transformation, transformation2: Transformation):
        from .exceptions import DomainMismatchError, MetricMismatchError

        if transformation1.output_domain != transformation2.input_domain:
            raise DomainMismatchError(
                "Cannot chain: output domain of first "
                f"({transformation1.output_domain!r}) != input domain of second "
                f"({transformation2.input_domain!r})"
            )
        if transformation1.output_metric != transformation2.input_metric:
            raise MetricMismatchError(
                "Cannot chain: output metric of first "
                f"({transformation1.output_metric!r}) != input metric of second "
                f"({transformation2.input_metric!r})"
            )
        super().__init__(
            input_domain=transformation1.input_domain,
            input_metric=transformation1.input_metric,
            output_domain=transformation2.output_domain,
            output_metric=transformation2.output_metric,
        )
        self.transformation1 = transformation1
        self.transformation2 = transformation2

    def stability_function(self, d_in: Any) -> Any:
        return self.transformation2.stability_function(
            self.transformation1.stability_function(d_in)
        )

    def __call__(self, data: Any) -> Any:
        return self.transformation2(self.transformation1(data))


class ChainTM(Measurement):
    """A transformation followed by a measurement (``t | m``)."""

    def __init__(self, transformation: Transformation, measurement: Measurement):
        from .exceptions import DomainMismatchError, MetricMismatchError

        if transformation.output_domain != measurement.input_domain:
            raise DomainMismatchError(
                "Cannot chain: output domain of transformation "
                f"({transformation.output_domain!r}) != input domain of measurement "
                f"({measurement.input_domain!r})"
            )
        if transformation.output_metric != measurement.input_metric:
            raise MetricMismatchError(
                "Cannot chain: output metric of transformation "
                f"({transformation.output_metric!r}) != input metric of measurement "
                f"({measurement.input_metric!r})"
            )
        super().__init__(
            input_domain=transformation.input_domain,
            input_metric=transformation.input_metric,
            output_measure=measurement.output_measure,
            is_interactive=measurement.is_interactive,
        )
        self.transformation = transformation
        self.measurement = measurement

    def privacy_function(self, d_in: Any) -> Any:
        return self.measurement.privacy_function(
            self.transformation.stability_function(d_in)
        )

    def __call__(self, data: Any) -> Any:
        return self.measurement(self.transformation(data))
