"""tumult_core_spark — a PySpark-native rebuild of the Tumult Core
composable differential-privacy framework.

Layers (bottom-up): exact_number / measures / metrics (driver math),
domains (typed schemas), base (Transformation / Measurement algebra),
transformations (relational ops over lazy DataFrames), measurements
(noise mechanisms and DP outputs), extensions (large-scale
training-data-pipeline operators beyond the reference).
"""

__version__ = "0.1.0"

from .base import ChainTM, ChainTT, Measurement, Transformation
from .exact_number import ExactNumber
from .exceptions import (
    DomainColumnError,
    DomainKeyError,
    DomainMismatchError,
    MeasureMismatchError,
    MetricMismatchError,
    OutOfDomainError,
    UnsupportedCombinationError,
    UnsupportedDomainError,
    UnsupportedMeasureError,
    UnsupportedMetricError,
    UnsupportedNoiseMechanismError,
)
from .measures import (
    ApproxDP,
    ApproxDPBudget,
    PrivacyBudget,
    PureDP,
    PureDPBudget,
    RhoZCDP,
    RhoZCDPBudget,
)
from .metrics import (
    AbsoluteDifference,
    AddRemoveKeys,
    DictMetric,
    HammingDistance,
    IfGroupedBy,
    NullMetric,
    OnColumn,
    OnColumns,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)
