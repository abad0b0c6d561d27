"""Multi-table (dict-of-DataFrames) pipeline transformations.

Mirrors reference ``transformations/dictionary.py:40-976``: wrap /
subset / extract named datasets, lift single-table transformations to
one key of the dict, and compose per-key pipelines.  All driver-side
plumbing; the wrapped Spark plans stay lazy.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence

from ..base import Transformation
from ..domains import DictDomain, Domain
from ..exact_number import ExactNumber
from ..metrics import DictMetric, Metric


class CreateDictFromValue(Transformation):
    """Wrap a dataset into a one-entry dict ``{key: ds}``."""

    def __init__(self, input_domain: Domain, input_metric: Metric, key: Any):
        super().__init__(
            input_domain,
            input_metric,
            DictDomain({key: input_domain}),
            DictMetric({key: input_metric}),
        )
        self.key = key

    def stability_function(self, d_in: Any) -> Dict[Any, Any]:
        self.input_metric.validate(d_in)
        return {self.key: d_in}

    def __call__(self, data: Any) -> Dict[Any, Any]:
        return {self.key: data}


class Subset(Transformation):
    """Project a dict domain to a subset of its keys."""

    def __init__(self, input_domain: DictDomain, input_metric: DictMetric, keys: Sequence[Any]):
        missing = [k for k in keys if k not in input_domain.key_to_domain]
        if missing:
            raise ValueError(f"Keys {missing} not in domain")
        out_domain = DictDomain({k: input_domain[k] for k in keys})
        out_metric = DictMetric({k: input_metric[k] for k in keys})
        super().__init__(input_domain, input_metric, out_domain, out_metric)
        self.keys = list(keys)

    def stability_function(self, d_in: Dict[Any, Any]) -> Dict[Any, Any]:
        self.input_metric.validate(d_in)
        return {k: d_in[k] for k in self.keys}

    def __call__(self, data: Dict[Any, Any]) -> Dict[Any, Any]:
        return {k: data[k] for k in self.keys}


class GetValue(Transformation):
    """Extract one dataset from the dict."""

    def __init__(self, input_domain: DictDomain, input_metric: DictMetric, key: Any):
        if key not in input_domain.key_to_domain:
            raise ValueError(f"Key {key!r} not in domain")
        super().__init__(
            input_domain,
            input_metric,
            input_domain[key],
            input_metric[key],
        )
        self.key = key

    def stability_function(self, d_in: Dict[Any, Any]) -> Any:
        self.input_metric.validate(d_in)
        return d_in[self.key]

    def __call__(self, data: Dict[Any, Any]) -> Any:
        return data[self.key]


class AugmentDictTransformation(Transformation):
    """Run an inner dict->dict transformation and append its outputs to
    the input dict (input keys pass through unchanged)."""

    def __init__(self, transformation: Transformation):
        in_domain = transformation.input_domain
        out_domain = transformation.output_domain
        if not isinstance(in_domain, DictDomain) or not isinstance(out_domain, DictDomain):
            raise ValueError("Inner transformation must be dict -> dict")
        overlap = set(in_domain.key_to_domain) & set(out_domain.key_to_domain)
        if overlap:
            raise ValueError(f"Output keys {overlap} already in input")
        merged_domain = DictDomain(
            {**in_domain.key_to_domain, **out_domain.key_to_domain}
        )
        merged_metric = DictMetric(
            {
                **transformation.input_metric.key_to_metric,
                **transformation.output_metric.key_to_metric,
            }
        )
        super().__init__(
            in_domain, transformation.input_metric, merged_domain, merged_metric
        )
        self.inner = transformation

    def stability_function(self, d_in: Dict[Any, Any]) -> Dict[Any, Any]:
        return {**d_in, **self.inner.stability_function(d_in)}

    def __call__(self, data: Dict[Any, Any]) -> Dict[Any, Any]:
        return {**data, **self.inner(data)}


class TransformValue(Transformation):
    """Apply a single-dataset transformation to one key of the dict,
    writing the result under ``new_key`` (other keys unchanged)."""

    def __init__(
        self,
        input_domain: DictDomain,
        input_metric: DictMetric,
        transformation: Transformation,
        key: Any,
        new_key: Any,
    ):
        if key not in input_domain.key_to_domain:
            raise ValueError(f"Key {key!r} not in domain")
        if new_key in input_domain.key_to_domain:
            raise ValueError(f"new_key {new_key!r} already in domain")
        if transformation.input_domain != input_domain[key]:
            raise ValueError("Transformation input domain != domain at key")
        if transformation.input_metric != input_metric[key]:
            raise ValueError("Transformation input metric != metric at key")
        out_domain = DictDomain(
            {**input_domain.key_to_domain, new_key: transformation.output_domain}
        )
        out_metric = DictMetric(
            {**input_metric.key_to_metric, new_key: transformation.output_metric}
        )
        super().__init__(input_domain, input_metric, out_domain, out_metric)
        self.transformation = transformation
        self.key = key
        self.new_key = new_key

    def stability_function(self, d_in: Dict[Any, Any]) -> Dict[Any, Any]:
        self.input_metric.validate(d_in)
        return {
            **d_in,
            self.new_key: self.transformation.stability_function(d_in[self.key]),
        }

    def __call__(self, data: Dict[Any, Any]) -> Dict[Any, Any]:
        return {**data, self.new_key: self.transformation(data[self.key])}


def create_copy_and_transform_value(
    input_domain: DictDomain,
    input_metric: DictMetric,
    transformation: Transformation,
    key: Any,
    new_key: Any,
) -> TransformValue:
    return TransformValue(input_domain, input_metric, transformation, key, new_key)


def create_rename(
    input_domain: DictDomain, input_metric: DictMetric, key: Any, new_key: Any
) -> Transformation:
    """Rename one dict key (remove old, add new)."""
    from .chaining_helpers import _FnDictTransformation

    if key not in input_domain.key_to_domain:
        raise ValueError(f"Key {key!r} not in domain")
    out_domain = DictDomain(
        {
            (new_key if k == key else k): d
            for k, d in input_domain.key_to_domain.items()
        }
    )
    out_metric = DictMetric(
        {
            (new_key if k == key else k): m
            for k, m in input_metric.key_to_metric.items()
        }
    )

    def fn(data):
        return {(new_key if k == key else k): v for k, v in data.items()}

    def stability(d_in):
        return {(new_key if k == key else k): v for k, v in d_in.items()}

    return _FnDictTransformation(
        input_domain, input_metric, out_domain, out_metric, fn, stability
    )


def create_transform_value(
    input_domain: DictDomain,
    input_metric: DictMetric,
    transformation: Transformation,
    key: Any,
) -> Transformation:
    """Replace the dataset at ``key`` with the transformed one."""
    from .chaining_helpers import _FnDictTransformation

    if transformation.input_domain != input_domain[key]:
        raise ValueError("Transformation input domain != domain at key")
    out_domain = DictDomain(
        {
            k: (transformation.output_domain if k == key else d)
            for k, d in input_domain.key_to_domain.items()
        }
    )
    out_metric = DictMetric(
        {
            k: (transformation.output_metric if k == key else m)
            for k, m in input_metric.key_to_metric.items()
        }
    )

    def fn(data):
        return {k: (transformation(v) if k == key else v) for k, v in data.items()}

    def stability(d_in):
        return {
            k: (transformation.stability_function(v) if k == key else v)
            for k, v in d_in.items()
        }

    return _FnDictTransformation(
        input_domain, input_metric, out_domain, out_metric, fn, stability
    )


def create_apply_dict_of_transformations(
    transformations: Mapping[Any, Transformation],
) -> Transformation:
    """Apply one transformation per key of a shared single input
    dataset, producing a dict of all outputs."""
    from .chaining_helpers import _FnDictTransformation

    if not transformations:
        raise ValueError("Need at least one transformation")
    items = list(transformations.items())
    first = items[0][1]
    for _, t in items[1:]:
        if t.input_domain != first.input_domain or t.input_metric != first.input_metric:
            raise ValueError("All transformations must share input domain/metric")
    out_domain = DictDomain({k: t.output_domain for k, t in items})
    out_metric = DictMetric({k: t.output_metric for k, t in items})

    def fn(data):
        return {k: t(data) for k, t in items}

    def stability(d_in):
        return {k: t.stability_function(d_in) for k, t in items}

    return _FnDictTransformation(
        first.input_domain, first.input_metric, out_domain, out_metric, fn, stability
    )


def create_transform_all_values(
    transformations: Mapping[Any, Transformation],
    input_domain: DictDomain,
    input_metric: DictMetric,
) -> Transformation:
    """Apply a per-key transformation to every dataset in the dict."""
    from .chaining_helpers import _FnDictTransformation

    for k, t in transformations.items():
        if t.input_domain != input_domain[k]:
            raise ValueError(f"Transformation at {k!r} has wrong input domain")
    out_domain = DictDomain(
        {k: transformations[k].output_domain for k in input_domain.key_to_domain}
    )
    out_metric = DictMetric(
        {k: transformations[k].output_metric for k in input_metric.key_to_metric}
    )

    def fn(data):
        return {k: transformations[k](v) for k, v in data.items()}

    def stability(d_in):
        return {
            k: transformations[k].stability_function(v) for k, v in d_in.items()
        }

    return _FnDictTransformation(
        input_domain, input_metric, out_domain, out_metric, fn, stability
    )
