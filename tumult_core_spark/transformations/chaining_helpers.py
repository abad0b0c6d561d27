"""Small generic transformation built from plain functions.

Used by the dictionary factories where defining one named class per
combinator adds nothing.
"""

from __future__ import annotations

from typing import Any, Callable

from ..base import Transformation
from ..domains import Domain
from ..metrics import Metric


class _FnDictTransformation(Transformation):
    def __init__(
        self,
        input_domain: Domain,
        input_metric: Metric,
        output_domain: Domain,
        output_metric: Metric,
        fn: Callable[[Any], Any],
        stability: Callable[[Any], Any],
    ):
        super().__init__(input_domain, input_metric, output_domain, output_metric)
        self._fn = fn
        self._stability = stability

    def stability_function(self, d_in: Any) -> Any:
        self.input_metric.validate(d_in)
        return self._stability(d_in)

    def __call__(self, data: Any) -> Any:
        return self._fn(data)
