"""Typed dataset domains.

A domain describes the set of values a dataset may take: for Spark
DataFrames that is a schema *plus* per-column null/NaN/Inf permissions
— strictly richer than ``StructType``.  Mirrors the reference's domain
layer (``tmlt/core/domains/spark_domains.py:41-640``,
``domains/collections.py``, ``domains/numpy_domains.py``,
``domains/pandas_domains.py``) as thin dataclasses over Spark types.

Data validation scans are **opt-in** (``validate(df, check_data=True)``):
at 100 TB a full-table null probe per operator construction is not
acceptable, so the default checks structure only (schema names, order,
types, nullability flags).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Sequence, Type, Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Domain(ABC):
    """Base class for domains."""

    @abstractmethod
    def validate(self, value: Any, check_data: bool = False) -> None:
        """Raise OutOfDomainError if ``value`` is not in this domain."""

    def __contains__(self, value: Any) -> bool:
        try:
            self.validate(value)
            return True
        except OutOfDomainError:
            return False


class OutOfDomainError(ValueError):
    """Raised when a value does not belong to a domain."""


# ---------------------------------------------------------------------------
# Column descriptors
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SparkColumnDescriptor:
    """Description of one column: Spark type + special-value permissions."""

    allow_null: bool = False

    def to_field(self, name: str) -> T.StructField:
        return T.StructField(name, self.data_type(), self.allow_null)

    def data_type(self) -> T.DataType:
        raise NotImplementedError

    def valid_py_value(self, value: Any) -> bool:
        """Driver-side check of a single python value against the descriptor."""
        if value is None:
            return self.allow_null
        return self._valid_non_null(value)

    def _valid_non_null(self, value: Any) -> bool:
        raise NotImplementedError


@dataclass(frozen=True)
class SparkIntegerColumnDescriptor(SparkColumnDescriptor):
    size: int = 64  # 32 -> IntegerType, 64 -> LongType

    _BOUNDS = {32: (-(2**31), 2**31 - 1), 64: (-(2**63), 2**63 - 1)}

    def __post_init__(self):
        if self.size not in (32, 64):
            raise ValueError(f"Integer size must be 32 or 64, got {self.size}")

    def data_type(self) -> T.DataType:
        return T.IntegerType() if self.size == 32 else T.LongType()

    def _valid_non_null(self, value: Any) -> bool:
        lo, hi = self._BOUNDS[self.size]
        return isinstance(value, (int, np.integer)) and lo <= int(value) <= hi


@dataclass(frozen=True)
class SparkFloatColumnDescriptor(SparkColumnDescriptor):
    allow_nan: bool = False
    allow_inf: bool = False
    size: int = 64  # 32 -> FloatType, 64 -> DoubleType

    def __post_init__(self):
        if self.size not in (32, 64):
            raise ValueError(f"Float size must be 32 or 64, got {self.size}")

    def data_type(self) -> T.DataType:
        return T.FloatType() if self.size == 32 else T.DoubleType()

    def _valid_non_null(self, value: Any) -> bool:
        if not isinstance(value, (float, np.floating)):
            return False
        v = float(value)
        if v != v:
            return self.allow_nan
        if v in (float("inf"), float("-inf")):
            return self.allow_inf
        return True


@dataclass(frozen=True)
class SparkStringColumnDescriptor(SparkColumnDescriptor):
    def data_type(self) -> T.DataType:
        return T.StringType()

    def _valid_non_null(self, value: Any) -> bool:
        return isinstance(value, str)


@dataclass(frozen=True)
class SparkDateColumnDescriptor(SparkColumnDescriptor):
    def data_type(self) -> T.DataType:
        return T.DateType()

    def _valid_non_null(self, value: Any) -> bool:
        import datetime

        return isinstance(value, datetime.date) and not isinstance(value, datetime.datetime)


@dataclass(frozen=True)
class SparkTimestampColumnDescriptor(SparkColumnDescriptor):
    # ntz=True for TimestampNTZType (how Spark 4 reads parquet
    # timestamps without timezone metadata).
    ntz: bool = False

    def data_type(self) -> T.DataType:
        return T.TimestampNTZType() if self.ntz else T.TimestampType()

    def _valid_non_null(self, value: Any) -> bool:
        import datetime

        return isinstance(value, datetime.datetime)


# Extension beyond the reference's seven types: opaque binary payloads
# (multimodal columns) and typed arrays (embeddings).  These are needed
# by the training-data-pipeline operators and are first-class here.


@dataclass(frozen=True)
class SparkBinaryColumnDescriptor(SparkColumnDescriptor):
    def data_type(self) -> T.DataType:
        return T.BinaryType()

    def _valid_non_null(self, value: Any) -> bool:
        return isinstance(value, (bytes, bytearray))


@dataclass(frozen=True)
class SparkArrayColumnDescriptor(SparkColumnDescriptor):
    element: SparkColumnDescriptor = field(default_factory=SparkFloatColumnDescriptor)

    def data_type(self) -> T.DataType:
        return T.ArrayType(self.element.data_type(), self.element.allow_null)

    def _valid_non_null(self, value: Any) -> bool:
        return isinstance(value, (list, tuple, np.ndarray)) and all(
            self.element.valid_py_value(v) for v in value
        )


_TYPE_TO_DESCRIPTOR: Dict[Type[T.DataType], SparkColumnDescriptor] = {}


def descriptor_from_field(fld: T.StructField) -> SparkColumnDescriptor:
    """Convert a StructField to the matching descriptor (permissive flags)."""
    dt = fld.dataType
    nullable = fld.nullable
    if isinstance(dt, T.IntegerType):
        return SparkIntegerColumnDescriptor(allow_null=nullable, size=32)
    if isinstance(dt, T.LongType):
        return SparkIntegerColumnDescriptor(allow_null=nullable, size=64)
    if isinstance(dt, T.FloatType):
        return SparkFloatColumnDescriptor(
            allow_null=nullable, allow_nan=True, allow_inf=True, size=32
        )
    if isinstance(dt, T.DoubleType):
        return SparkFloatColumnDescriptor(
            allow_null=nullable, allow_nan=True, allow_inf=True, size=64
        )
    if isinstance(dt, T.StringType):
        return SparkStringColumnDescriptor(allow_null=nullable)
    if isinstance(dt, T.DateType):
        return SparkDateColumnDescriptor(allow_null=nullable)
    if isinstance(dt, T.TimestampType):
        return SparkTimestampColumnDescriptor(allow_null=nullable)
    if isinstance(dt, T.TimestampNTZType):
        return SparkTimestampColumnDescriptor(allow_null=nullable, ntz=True)
    if isinstance(dt, T.BinaryType):
        return SparkBinaryColumnDescriptor(allow_null=nullable)
    if isinstance(dt, T.ArrayType):
        elem = descriptor_from_field(T.StructField("e", dt.elementType, dt.containsNull))
        return SparkArrayColumnDescriptor(allow_null=nullable, element=elem)
    raise OutOfDomainError(f"Unsupported Spark type: {dt}")


# ---------------------------------------------------------------------------
# DataFrame / Row domains
# ---------------------------------------------------------------------------


class SparkDataFrameDomain(Domain):
    """Domain of DataFrames with a fixed ordered schema.

    ``schema`` maps column name -> descriptor; column **order matters**
    (two domains with the same columns in different order are unequal,
    as in the reference ``spark_domains.py:342``).
    """

    def __init__(self, schema: Mapping[str, SparkColumnDescriptor]):
        if not schema:
            raise ValueError("SparkDataFrameDomain requires at least one column")
        self.schema: Dict[str, SparkColumnDescriptor] = dict(schema)

    @classmethod
    def from_spark_schema(
        cls, spark_schema: T.StructType, strict: bool = False
    ) -> "SparkDataFrameDomain":
        """Build a domain from a StructType.

        ``strict=True`` asserts no nulls/NaN/Inf anywhere (the caller's
        responsibility to guarantee, e.g. clean parquet inputs) —
        required before Sum-like aggregations.
        """
        import dataclasses

        schema = {}
        for f in spark_schema.fields:
            d = descriptor_from_field(f)
            if strict:
                d = dataclasses.replace(d, allow_null=False)
                if isinstance(d, SparkFloatColumnDescriptor):
                    d = dataclasses.replace(d, allow_nan=False, allow_inf=False)
            schema[f.name] = d
        return cls(schema)

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType([d.to_field(name) for name, d in self.schema.items()])

    @property
    def columns(self) -> List[str]:
        return list(self.schema)

    def __getitem__(self, column: str) -> SparkColumnDescriptor:
        return self.schema[column]

    def project(self, columns: Sequence[str]) -> "SparkDataFrameDomain":
        return SparkDataFrameDomain({c: self.schema[c] for c in columns})

    def validate(self, value: Any, check_data: bool = False) -> None:
        if not isinstance(value, DataFrame):
            raise OutOfDomainError(f"Expected DataFrame, got {type(value).__name__}")
        actual = value.schema
        expected = self.spark_schema
        if [f.name for f in actual.fields] != [f.name for f in expected.fields]:
            raise OutOfDomainError(
                f"Column mismatch: expected {[f.name for f in expected.fields]}, "
                f"got {[f.name for f in actual.fields]}"
            )
        for af, ef in zip(actual.fields, expected.fields):
            if af.dataType != ef.dataType:
                raise OutOfDomainError(
                    f"Column {af.name!r}: expected {ef.dataType}, got {af.dataType}"
                )
        if check_data:
            self._validate_data(value)

    def _validate_data(self, df: DataFrame) -> None:
        # Single pass: count violations for all columns at once rather
        # than one filter-probe per column (reference does per-column
        # ``df.filter(...).first()`` scans — O(columns) table scans).
        checks = []
        for name, desc in self.schema.items():
            if not desc.allow_null:
                checks.append(
                    F.sum(F.col(name).isNull().cast("long")).alias(f"{name}__null")
                )
            if isinstance(desc, SparkFloatColumnDescriptor):
                if not desc.allow_nan:
                    checks.append(
                        F.sum(F.isnan(F.col(name)).cast("long")).alias(f"{name}__nan")
                    )
                if not desc.allow_inf:
                    checks.append(
                        F.sum(
                            F.col(name).isin(float("inf"), float("-inf")).cast("long")
                        ).alias(f"{name}__inf")
                    )
        if not checks:
            return
        row = df.select(checks).first()
        for key, count in row.asDict().items():
            if count and count > 0:
                col, kind = key.rsplit("__", 1)
                raise OutOfDomainError(
                    f"Column {col!r} contains {count} forbidden {kind} value(s)"
                )

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and list(self.schema.items()) == list(
            other.schema.items()
        )

    def __hash__(self) -> int:
        return hash((type(self), tuple(self.schema.items())))

    def __repr__(self) -> str:
        return f"SparkDataFrameDomain({self.schema!r})"


class SparkRowDomain(Domain):
    """Domain of single Rows (UDF input/output descriptions)."""

    def __init__(self, schema: Mapping[str, SparkColumnDescriptor]):
        self.schema = dict(schema)

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType([d.to_field(n) for n, d in self.schema.items()])

    def validate(self, value: Any, check_data: bool = False) -> None:
        if not isinstance(value, (Row, dict)):
            raise OutOfDomainError(f"Expected Row, got {type(value).__name__}")
        d = value.asDict() if isinstance(value, Row) else value
        if set(d) != set(self.schema):
            raise OutOfDomainError(
                f"Row fields {set(d)} != expected {set(self.schema)}"
            )
        for name, desc in self.schema.items():
            if not desc.valid_py_value(d[name]):
                raise OutOfDomainError(f"Field {name!r}={d[name]!r} invalid for {desc}")

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and list(self.schema.items()) == list(
            other.schema.items()
        )

    def __hash__(self) -> int:
        return hash((type(self), tuple(self.schema.items())))

    def __repr__(self) -> str:
        return f"SparkRowDomain({self.schema!r})"


class SparkGroupedDataFrameDomain(Domain):
    """Domain of GroupedDataFrames: schema + fixed public group keys."""

    def __init__(self, schema: Mapping[str, SparkColumnDescriptor], groupby_columns: Sequence[str]):
        self.schema = dict(schema)
        self.groupby_columns = list(groupby_columns)
        for c in self.groupby_columns:
            if c not in self.schema:
                raise ValueError(f"Groupby column {c!r} not in schema")
            if isinstance(self.schema[c], SparkFloatColumnDescriptor):
                raise ValueError(f"Cannot group by float column {c!r}")

    def get_group_domain(self) -> SparkDataFrameDomain:
        """Domain of each group's rows (all columns)."""
        return SparkDataFrameDomain(self.schema)

    def validate(self, value: Any, check_data: bool = False) -> None:
        from .utils.grouped_dataframe import GroupedDataFrame

        if not isinstance(value, GroupedDataFrame):
            raise OutOfDomainError(
                f"Expected GroupedDataFrame, got {type(value).__name__}"
            )
        SparkDataFrameDomain(self.schema).validate(value.dataframe, check_data)
        if value.groupby_columns != self.groupby_columns:
            raise OutOfDomainError(
                f"Groupby columns {value.groupby_columns} != {self.groupby_columns}"
            )

    def __eq__(self, other: Any) -> bool:
        return (
            type(self) is type(other)
            and list(self.schema.items()) == list(other.schema.items())
            and self.groupby_columns == other.groupby_columns
        )

    def __hash__(self) -> int:
        return hash((type(self), tuple(self.schema.items()), tuple(self.groupby_columns)))

    def __repr__(self) -> str:
        return f"SparkGroupedDataFrameDomain({self.schema!r}, {self.groupby_columns!r})"


# ---------------------------------------------------------------------------
# Collections + scalar domains
# ---------------------------------------------------------------------------


class DictDomain(Domain):
    """Dict of named datasets (a catalog of private tables)."""

    def __init__(self, key_to_domain: Mapping[Any, Domain]):
        self.key_to_domain = dict(key_to_domain)

    def validate(self, value: Any, check_data: bool = False) -> None:
        if not isinstance(value, dict):
            raise OutOfDomainError(f"Expected dict, got {type(value).__name__}")
        if set(value) != set(self.key_to_domain):
            raise OutOfDomainError(
                f"Keys {set(value)} != expected {set(self.key_to_domain)}"
            )
        for k, dom in self.key_to_domain.items():
            dom.validate(value[k], check_data)

    def __getitem__(self, key: Any) -> Domain:
        return self.key_to_domain[key]

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and self.key_to_domain == other.key_to_domain

    def __hash__(self) -> int:
        return hash((type(self), tuple(sorted(self.key_to_domain.items(), key=lambda kv: str(kv[0])))))

    def __repr__(self) -> str:
        return f"DictDomain({self.key_to_domain!r})"


class ListDomain(Domain):
    """List of datasets from a shared element domain (partitions)."""

    def __init__(self, element_domain: Domain, length: Optional[int] = None):
        self.element_domain = element_domain
        self.length = length

    def validate(self, value: Any, check_data: bool = False) -> None:
        if not isinstance(value, list):
            raise OutOfDomainError(f"Expected list, got {type(value).__name__}")
        if self.length is not None and len(value) != self.length:
            raise OutOfDomainError(f"Expected length {self.length}, got {len(value)}")
        for v in value:
            self.element_domain.validate(v, check_data)

    def __eq__(self, other: Any) -> bool:
        return (
            type(self) is type(other)
            and self.element_domain == other.element_domain
            and self.length == other.length
        )

    def __hash__(self) -> int:
        return hash((type(self), self.element_domain, self.length))

    def __repr__(self) -> str:
        return f"ListDomain({self.element_domain!r}, length={self.length})"


class NumpyIntegerDomain(Domain):
    """np.int64 / np.int32 scalars (aggregation outputs)."""

    def __init__(self, size: int = 64):
        if size not in (32, 64):
            raise ValueError("size must be 32 or 64")
        self.size = size

    def validate(self, value: Any, check_data: bool = False) -> None:
        ok = isinstance(value, np.int32) if self.size == 32 else isinstance(value, np.int64)
        if not ok:
            raise OutOfDomainError(f"Expected np.int{self.size}, got {type(value).__name__}")

    def __eq__(self, other):
        return type(self) is type(other) and self.size == other.size

    def __hash__(self):
        return hash((type(self), self.size))

    def __repr__(self):
        return f"NumpyIntegerDomain(size={self.size})"


class NumpyFloatDomain(Domain):
    """np.float64 / np.float32 scalars."""

    def __init__(self, allow_nan: bool = False, allow_inf: bool = False, size: int = 64):
        if size not in (32, 64):
            raise ValueError("size must be 32 or 64")
        self.allow_nan = allow_nan
        self.allow_inf = allow_inf
        self.size = size

    def validate(self, value: Any, check_data: bool = False) -> None:
        ok = isinstance(value, np.float32) if self.size == 32 else isinstance(value, np.float64)
        if not ok:
            raise OutOfDomainError(f"Expected np.float{self.size}, got {type(value).__name__}")
        v = float(value)
        if v != v and not self.allow_nan:
            raise OutOfDomainError("NaN not allowed")
        if v in (float("inf"), float("-inf")) and not self.allow_inf:
            raise OutOfDomainError("Inf not allowed")

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and (self.allow_nan, self.allow_inf, self.size)
            == (other.allow_nan, other.allow_inf, other.size)
        )

    def __hash__(self):
        return hash((type(self), self.allow_nan, self.allow_inf, self.size))

    def __repr__(self):
        return f"NumpyFloatDomain(allow_nan={self.allow_nan}, allow_inf={self.allow_inf}, size={self.size})"


class NumpyStringDomain(Domain):
    def __init__(self, allow_null: bool = False):
        self.allow_null = allow_null

    def validate(self, value: Any, check_data: bool = False) -> None:
        if value is None:
            if not self.allow_null:
                raise OutOfDomainError("null not allowed")
            return
        if not isinstance(value, (str, np.str_)):
            raise OutOfDomainError(f"Expected str, got {type(value).__name__}")

    def __eq__(self, other):
        return type(self) is type(other) and self.allow_null == other.allow_null

    def __hash__(self):
        return hash((type(self), self.allow_null))

    def __repr__(self):
        return f"NumpyStringDomain(allow_null={self.allow_null})"


class PandasSeriesDomain(Domain):
    """pd.Series whose elements come from a scalar numpy domain."""

    def __init__(self, element_domain: Domain):
        self.element_domain = element_domain

    def validate(self, value: Any, check_data: bool = False) -> None:
        if not isinstance(value, pd.Series):
            raise OutOfDomainError(f"Expected pd.Series, got {type(value).__name__}")

    def __eq__(self, other):
        return type(self) is type(other) and self.element_domain == other.element_domain

    def __hash__(self):
        return hash((type(self), self.element_domain))

    def __repr__(self):
        return f"PandasSeriesDomain({self.element_domain!r})"


class PandasDataFrameDomain(Domain):
    """pd.DataFrame with per-column series domains."""

    def __init__(self, schema: Mapping[str, PandasSeriesDomain]):
        self.schema = dict(schema)

    def validate(self, value: Any, check_data: bool = False) -> None:
        if not isinstance(value, pd.DataFrame):
            raise OutOfDomainError(f"Expected pd.DataFrame, got {type(value).__name__}")
        if list(value.columns) != list(self.schema):
            raise OutOfDomainError(
                f"Columns {list(value.columns)} != expected {list(self.schema)}"
            )

    def __eq__(self, other):
        return type(self) is type(other) and list(self.schema.items()) == list(other.schema.items())

    def __hash__(self):
        return hash((type(self), tuple(self.schema.items())))

    def __repr__(self):
        return f"PandasDataFrameDomain({self.schema!r})"
