"""Lift single-table transformations to a dict of tables under the
AddRemoveKeys (user-level) metric.

Under ``AddRemoveKeys`` the distance between two dicts of DataFrames
is the number of *key values* whose rows differ anywhere.  A
transformation applied to one table preserves that distance only if
it never moves rows between keys — hence the explicit whitelist of
liftable transformations rather than a generic lift (the reference's
rationale at ``transformations/add_remove_keys.py:1-41``; subclasses
at :300-976).

Every ``*Value`` class below applies its wrapped transformation to
``dfs[key]`` and stores the result under ``new_key``; stability is
``d_in`` (key-count distance is unchanged).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

from pyspark.sql import DataFrame

from ..base import Transformation
from ..domains import DictDomain, SparkDataFrameDomain
from ..exact_number import ExactNumber
from ..metrics import AddRemoveKeys, IfGroupedBy, SymmetricDifference
from .rows import (
    DropInfs,
    DropNaNs,
    DropNulls,
    Filter,
    Persist,
    Rename,
    ReplaceInfs,
    ReplaceNaNs,
    ReplaceNulls,
    Select,
    SparkAction,
    Unpersist,
)
from .truncation import (
    LimitKeysPerGroup,
    LimitRowsPerGroup,
    LimitRowsPerKeyPerGroup,
)


class TransformValue(Transformation):
    """Base lift: run ``transformation`` on ``dfs[key]`` -> ``new_key``.

    The wrapped transformation must carry an ``IfGroupedBy(key_column,
    SymmetricDifference)``-compatible contract: it may drop or rewrite
    rows within a key but never create rows for new keys.  Subclasses
    fix which transformation types are allowed.
    """

    def __init__(
        self,
        input_domain: DictDomain,
        input_metric: AddRemoveKeys,
        transformation: Transformation,
        key: Any,
        new_key: Any,
    ):
        if key not in input_domain.key_to_domain:
            raise ValueError(f"Key {key!r} not in domain")
        if new_key in input_domain.key_to_domain:
            raise ValueError(f"new_key {new_key!r} already in domain")
        key_column = input_metric.df_to_key_column.get(str(key))
        if key_column is None:
            raise ValueError(f"Key {key!r} missing from AddRemoveKeys metric")
        if transformation.input_domain != input_domain[key]:
            raise ValueError("Transformation input domain != domain at key")
        out_table_domain = transformation.output_domain
        if isinstance(out_table_domain, SparkDataFrameDomain):
            if key_column not in out_table_domain.schema:
                raise ValueError(
                    f"Transformation drops the key column {key_column!r}"
                )
        out_key_column = key_column
        # a rename may relocate the key column
        if isinstance(transformation, Rename):
            out_key_column = transformation.rename_mapping.get(key_column, key_column)
        out_domain = DictDomain(
            {**input_domain.key_to_domain, new_key: out_table_domain}
        )
        out_metric = AddRemoveKeys(
            {**input_metric.df_to_key_column, str(new_key): out_key_column}
        )
        super().__init__(input_domain, input_metric, out_domain, out_metric)
        self.transformation = transformation
        self.key = key
        self.new_key = new_key

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in)

    def __call__(self, dfs: Dict[Any, DataFrame]) -> Dict[Any, DataFrame]:
        return {**dfs, self.new_key: self.transformation(dfs[self.key])}


def _make_value_class(name: str, allowed_type: type) -> type:
    """A TransformValue subclass accepting exactly one transformation type."""

    def __init__(self, input_domain, input_metric, transformation, key, new_key):
        if not isinstance(transformation, allowed_type):
            raise ValueError(
                f"{name} requires a {allowed_type.__name__} transformation"
            )
        TransformValue.__init__(
            self, input_domain, input_metric, transformation, key, new_key
        )

    return type(
        name,
        (TransformValue,),
        {
            "__init__": __init__,
            "__doc__": f"Lift {allowed_type.__name__} to one dict entry "
            "under AddRemoveKeys.",
        },
    )


FilterValue = _make_value_class("FilterValue", Filter)
SelectValue = _make_value_class("SelectValue", Select)
RenameValue = _make_value_class("RenameValue", Rename)
DropInfsValue = _make_value_class("DropInfsValue", DropInfs)
DropNaNsValue = _make_value_class("DropNaNsValue", DropNaNs)
DropNullsValue = _make_value_class("DropNullsValue", DropNulls)
ReplaceInfsValue = _make_value_class("ReplaceInfsValue", ReplaceInfs)
ReplaceNaNsValue = _make_value_class("ReplaceNaNsValue", ReplaceNaNs)
ReplaceNullsValue = _make_value_class("ReplaceNullsValue", ReplaceNulls)
PersistValue = _make_value_class("PersistValue", Persist)
UnpersistValue = _make_value_class("UnpersistValue", Unpersist)
SparkActionValue = _make_value_class("SparkActionValue", SparkAction)
LimitRowsPerGroupValue = _make_value_class(
    "LimitRowsPerGroupValue", LimitRowsPerGroup
)
LimitKeysPerGroupValue = _make_value_class(
    "LimitKeysPerGroupValue", LimitKeysPerGroup
)
LimitRowsPerKeyPerGroupValue = _make_value_class(
    "LimitRowsPerKeyPerGroupValue", LimitRowsPerKeyPerGroup
)


class FlatMapValue(TransformValue):
    """Lift FlatMap (with IfGroupedBy metric on the key column)."""

    def __init__(self, input_domain, input_metric, transformation, key, new_key):
        from .map import FlatMap

        if not isinstance(transformation, FlatMap):
            raise ValueError("FlatMapValue requires a FlatMap transformation")
        if not isinstance(transformation.input_metric, IfGroupedBy):
            raise ValueError(
                "FlatMapValue requires the FlatMap to use an IfGroupedBy metric"
            )
        super().__init__(input_domain, input_metric, transformation, key, new_key)


class FlatMapByKeyValue(TransformValue):
    """Lift FlatMapByKey (reference ``add_remove_keys.py:508-542``):
    apply a trusted [Rows] -> [Rows] transformer to all rows sharing a
    key value, storing the result under ``new_key``.

    The wrapped FlatMapByKey must group by the SAME column the
    AddRemoveKeys metric tracks for ``key``: grouping by any other
    column would let one tracked key's rows influence another's
    output, breaking the key-count distance.  Each tracked key is
    transformed independently, so stability is ``d_in``.
    """

    def __init__(self, input_domain, input_metric, transformation, key, new_key):
        from .map import FlatMapByKey

        if not isinstance(transformation, FlatMapByKey):
            raise ValueError(
                "FlatMapByKeyValue requires a FlatMapByKey transformation"
            )
        key_column = input_metric.df_to_key_column.get(str(key))
        if key_column is not None and transformation.key_column != key_column:
            raise ValueError(
                f"FlatMapByKey groups by {transformation.key_column!r} but the"
                f" AddRemoveKeys metric tracks {key_column!r} for key {key!r}"
            )
        super().__init__(input_domain, input_metric, transformation, key, new_key)


class MapValue(TransformValue):
    """Lift Map (augmenting, with IfGroupedBy metric on the key column)."""

    def __init__(self, input_domain, input_metric, transformation, key, new_key):
        from .map import Map

        if not isinstance(transformation, Map):
            raise ValueError("MapValue requires a Map transformation")
        if not isinstance(transformation.input_metric, IfGroupedBy):
            raise ValueError(
                "MapValue requires the Map to use an IfGroupedBy metric"
            )
        super().__init__(input_domain, input_metric, transformation, key, new_key)


class PublicJoinValue(TransformValue):
    """Lift PublicJoin (under IfGroupedBy on the key column)."""

    def __init__(self, input_domain, input_metric, transformation, key, new_key):
        from .join import PublicJoin

        if not isinstance(transformation, PublicJoin):
            raise ValueError("PublicJoinValue requires a PublicJoin transformation")
        super().__init__(input_domain, input_metric, transformation, key, new_key)
