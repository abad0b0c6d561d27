"""Interactive measurements and the privacy accountant.

Driver-side state machines mirroring the reference's interactive layer
(``measurements/interactive_measurements.py:199-1900``):

* ``SequentialComposition`` — an interactive measurement that yields a
  ``SequentialQueryable`` holding the private data and a remaining
  budget; queries are answered adaptively, each deducting its cost.
* ``ParallelComposition`` — answers one measurement per element of a
  partition list; because partitions are disjoint under
  SumOf/RootSumOfSquared metrics, the whole round costs the *maximum*
  (not the sum) of the per-partition losses.
* ``PrivacyAccountant`` — user-facing ledger over a queryable:
  ``transform_in_place`` / ``measure`` / ``split``, with the
  ACTIVE -> WAITING_FOR_CHILDREN / WAITING_FOR_SIBLING -> RETIRED
  lifecycle that enforces sequential-adaptive ordering.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, List, Optional, Sequence

from ..base import Measurement, Transformation
from ..domains import Domain, ListDomain
from ..exact_number import ExactNumber
from ..measures import ApproxDP, InsufficientBudgetError, Measure, PrivacyBudget
from ..metrics import Metric, RootSumOfSquared, SumOf


def _loss_to_budget(measure: Measure, loss: Any) -> PrivacyBudget:
    return PrivacyBudget.cast(measure, loss)


class Queryable:
    """Base class for queryables: exactly one public method,
    ``__call__`` (reference ``interactive_measurements.py:41-52``).
    Subclassing this is what lets :class:`RetirableQueryable` recognize
    a nested-queryable answer and wrap it for cascade retirement."""

    def __call__(self, query: Any) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass
class MeasurementQuery:
    """A measurement plus the optional ``d_out`` it claims to satisfy
    (reference ``interactive_measurements.py:55-82``); ``d_in`` is
    known by the answering queryable.  ``d_out`` is only needed when
    the measurement's ``privacy_function`` is not implemented — when
    given, it is validated against ``privacy_relation``."""

    measurement: Measurement
    d_out: Optional[Any] = None

    def __post_init__(self) -> None:
        if not isinstance(self.measurement, Measurement):
            raise TypeError("measurement must be a Measurement")
        if self.d_out is not None:
            self.measurement.output_measure.validate(self.d_out)


@dataclass
class TransformationQuery:
    """A transformation plus the optional ``d_out`` it claims
    (reference ``interactive_measurements.py:85-111``); validated
    against ``stability_relation`` when given."""

    transformation: Transformation
    d_out: Optional[Any] = None

    def __post_init__(self) -> None:
        if not isinstance(self.transformation, Transformation):
            raise TypeError("transformation must be a Transformation")
        if self.d_out is not None:
            self.transformation.output_metric.validate(self.d_out)


@dataclass
class IndexQuery:
    """The index of the next partition to open (reference
    ``interactive_measurements.py:114-123``); answered by
    :class:`ParallelQueryable` strictly in ascending order."""

    index: int


class RetireQuery:
    """Retires a :class:`RetirableQueryable` and every descendant
    (reference ``interactive_measurements.py:126-133``)."""


class RetirableQueryable(Queryable):
    """Wrap a queryable so that it — and transitively every queryable
    it ever answers with — can be retired in one cascade (reference
    ``interactive_measurements.py:136-196``).

    Behavior of submitting ``q`` to an instance ``RQ``:

    * ``RetireQuery`` — every child receives ``RetireQuery``, ``RQ``
      becomes retired, returns ``None`` (idempotent).
    * otherwise, if active: the inner queryable answers; a queryable
      answer is wrapped in a new child ``RetirableQueryable``.
    * otherwise (retired): raises ``RuntimeError``.

    This is the mechanism that lets :class:`SequentialQueryable` and
    :class:`ParallelQueryable` revoke a previously-opened interactive
    session when the next one starts — the structural guarantee behind
    sequential-adaptive composition.
    """

    def __init__(self, queryable: Queryable):
        self._inner_queryable = queryable
        self._children: List["RetirableQueryable"] = []
        self._is_retired = False

    @property
    def is_retired(self) -> bool:
        return self._is_retired

    def __call__(self, query: Any) -> Any:
        if isinstance(query, RetireQuery):
            if not self._is_retired:
                for child in self._children:
                    child(RetireQuery())
                self._is_retired = True
            return None
        if self._is_retired:
            raise RuntimeError("Queryable already retired")
        answer = self._inner_queryable(query)
        if isinstance(answer, Queryable):
            child = RetirableQueryable(answer)
            self._children.append(child)
            return child
        return answer


class SequentialQueryable(Queryable):
    """Holds private data + remaining budget; answers queries adaptively."""

    def __init__(
        self,
        input_domain: Domain,
        input_metric: Metric,
        output_measure: Measure,
        d_in: Any,
        budget: PrivacyBudget,
        data: Any,
    ):
        self._input_domain = input_domain
        self._input_metric = input_metric
        self._output_measure = output_measure
        self._d_in = d_in
        self._remaining = budget
        self._data = data
        self._previous_queryable: Optional[RetirableQueryable] = None

    @property
    def remaining_budget(self) -> PrivacyBudget:
        return self._remaining

    def __call__(self, query: Any) -> Any:
        """Answer a query.

        Three accepted forms:

        * a plain ``Measurement`` — answered directly (this engine's
          convenience path, used by :class:`PrivacyAccountant`);
        * a :class:`MeasurementQuery` — the reference's typed form
          (``interactive_measurements.py:235-295``): the measurement
          must be INTERACTIVE, a claimed ``d_out`` is validated via
          ``privacy_relation`` and charged instead of calling
          ``privacy_function``, any previously-returned queryable is
          retired (with its whole descendant tree), and the answer
          comes back wrapped in a :class:`RetirableQueryable`;
        * a :class:`TransformationQuery` — transforms the held data in
          place (``:296-326``), with an optional claimed ``d_out``
          validated via ``stability_relation``.
        """
        if isinstance(query, TransformationQuery):
            t = query.transformation
            if t.input_domain != self._input_domain:
                raise ValueError("Transformation input domain does not match")
            if t.input_metric != self._input_metric:
                raise ValueError("Transformation input metric does not match")
            self._data = t(self._data)
            if query.d_out is not None:
                if not t.stability_relation(self._d_in, query.d_out):
                    raise ValueError(
                        "Transformation's stability relation cannot be "
                        f"satisfied with given d_out ({query.d_out})"
                    )
                self._d_in = query.d_out
            else:
                self._d_in = t.stability_function(self._d_in)
            self._input_domain = t.output_domain
            self._input_metric = t.output_metric
            return None
        if isinstance(query, MeasurementQuery):
            measurement, d_out = query.measurement, query.d_out
            if not measurement.is_interactive:
                raise ValueError(
                    "SequentialQueryable does not answer non-interactive "
                    "measurement queries via MeasurementQuery; wrap with "
                    "MakeInteractive (or submit the bare Measurement)"
                )
        else:
            measurement, d_out = query, None
        if measurement.input_domain != self._input_domain:
            raise ValueError("Measurement input domain does not match")
        if measurement.input_metric != self._input_metric:
            raise ValueError("Measurement input metric does not match")
        if measurement.output_measure != self._output_measure:
            raise ValueError("Measurement output measure does not match")
        if d_out is not None:
            if not measurement.privacy_relation(self._d_in, d_out):
                raise ValueError(
                    "Measurement's privacy relation cannot be satisfied "
                    f"with given d_out ({d_out})"
                )
            loss = d_out
        else:
            loss = measurement.privacy_function(self._d_in)
        cost = _loss_to_budget(self._output_measure, loss)
        if not self._remaining.can_spend(cost):
            raise InsufficientBudgetError(self._remaining, cost)
        if self._remaining.is_finite():
            self._remaining = self._remaining.subtract(cost)
        if isinstance(query, MeasurementQuery) or measurement.is_interactive:
            # opening a new interactive session revokes the previous
            # one and its entire descendant tree.  A BARE interactive
            # measurement takes this path too: answering it unwrapped
            # would leave a live queryable outside the retire cascade,
            # letting adaptive sessions run concurrently (r16 review).
            if self._previous_queryable is not None:
                self._previous_queryable(RetireQuery())
            answer = measurement(self._data)
            wrapped = RetirableQueryable(answer)
            self._previous_queryable = wrapped
            return wrapped
        return measurement(self._data)

    def transform(self, transformation: Transformation) -> None:
        """Replace the data in place; d_in updates via stability."""
        if transformation.input_domain != self._input_domain:
            raise ValueError("Transformation input domain does not match")
        if transformation.input_metric != self._input_metric:
            raise ValueError("Transformation input metric does not match")
        self._data = transformation(self._data)
        self._d_in = transformation.stability_function(self._d_in)
        self._input_domain = transformation.output_domain
        self._input_metric = transformation.output_metric


class SequentialComposition(Measurement):
    """Interactive measurement: spend an overall budget adaptively."""

    def __init__(
        self,
        input_domain: Domain,
        input_metric: Metric,
        output_measure: Measure,
        d_in: Any,
        privacy_budget: PrivacyBudget,
    ):
        super().__init__(
            input_domain, input_metric, output_measure, is_interactive=True
        )
        if not isinstance(privacy_budget, PrivacyBudget):
            privacy_budget = PrivacyBudget.cast(output_measure, privacy_budget)
        elif privacy_budget.measure != output_measure:
            # validated at construction (reference validates the budget
            # against the output measure up front) — otherwise the
            # mismatch surfaces as a confusing can_spend crash at the
            # first query
            raise ValueError(
                f"privacy_budget is denominated in {privacy_budget.measure!r} "
                f"but the output measure is {output_measure!r}"
            )
        self.d_in = d_in
        self.privacy_budget = privacy_budget

    def privacy_function(self, d_in: Any) -> Any:
        if not self.input_metric.compare(d_in, self.d_in):
            raise ValueError(f"d_in {d_in} exceeds declared {self.d_in}")
        v = self.privacy_budget.value
        return v

    def __call__(self, data: Any) -> SequentialQueryable:
        return SequentialQueryable(
            self.input_domain,
            self.input_metric,
            self.output_measure,
            self.d_in,
            self.privacy_budget,
            data,
        )


class ParallelComposition(Measurement):
    """One measurement per element of a partition list.

    Partitions are disjoint, so a single neighboring-row change lands
    in exactly one element: the round costs max_i(loss_i).
    """

    #: The metric/measure pairs under which "disjoint partitions cost
    #: the max" is a theorem (reference
    #: ``interactive_measurements.py:597-612``): additive measures
    #: compose across a SumOf split, zCDP across a RootSumOfSquared
    #: split.  Off-grid pairs (e.g. SumOf + RhoZCDP) silently
    #: under-charge and are rejected.  Exact types: RootSumOfSquared
    #: subclasses SumOf here, so an isinstance check would let
    #: RootSumOfSquared + PureDP through.
    _VALID_METRIC_MEASURE: tuple = (
        ("SumOf", "PureDP"),
        ("SumOf", "ApproxDP"),
        ("RootSumOfSquared", "RhoZCDP"),
    )

    def __init__(
        self,
        input_domain: ListDomain,
        input_metric: Metric,
        measurements: Sequence[Measurement],
    ):
        if not measurements:
            raise ValueError(
                "ParallelComposition requires at least one measurement"
            )
        if not isinstance(input_metric, (SumOf, RootSumOfSquared)):
            raise ValueError("input metric must be SumOf or RootSumOfSquared")
        if input_domain.length is None:
            # reference interactive_measurements.py:657-661: an
            # undeclared-length ListDomain is rejected at construction
            # (r17 — previously __call__'s partition-count check
            # compensated at answer time, but privacy_function could
            # be consulted before any data arrived)
            raise ValueError(
                "Input domain for ParallelComposition must specify the "
                "number of elements"
            )
        if input_domain.length != len(measurements):
            raise ValueError("One measurement per partition required")
        first = measurements[0]
        combo = (type(input_metric).__name__, type(first.output_measure).__name__)
        if combo not in self._VALID_METRIC_MEASURE:
            raise ValueError(
                f"Input metric {type(input_metric).__name__} is incompatible "
                f"with output measure {type(first.output_measure).__name__}; "
                f"valid combinations: {self._VALID_METRIC_MEASURE}"
            )
        for m in measurements:
            if m.input_domain != input_domain.element_domain:
                raise ValueError("Measurement domain != element domain")
            if m.input_metric != input_metric.inner_metric:
                raise ValueError(
                    "Each measurement's input metric must match the inner "
                    f"metric of the composition's input metric "
                    f"({m.input_metric!r} != {input_metric.inner_metric!r}); "
                    "a unit mismatch here miscalibrates every partition's "
                    "privacy function"
                )
            if m.output_measure != first.output_measure:
                raise ValueError("All measurements must share an output measure")
        super().__init__(input_domain, input_metric, first.output_measure)
        self.measurements = list(measurements)

    def privacy_function(self, d_in: Any) -> Any:
        losses = [m.privacy_function(d_in) for m in self.measurements]
        if isinstance(self.output_measure, ApproxDP):
            eps = max(ExactNumber(l[0]) for l in losses)
            delta = max(ExactNumber(l[1]) for l in losses)
            d_out: Any = (eps, delta)
        else:
            d_out = max(ExactNumber(l) for l in losses)
        # reference interactive_measurements.py:714: every member must
        # itself satisfy the composed claim at d_in — a cheap guard
        # against mismatched custom members (the deeper non-linear-in-d
        # caveat is documented in LIMITATIONS.md, as in the reference).
        # Raised explicitly rather than via `assert` so the soundness
        # check survives `python -O` (r17; the reference's own assert
        # does not).
        if not all(m.privacy_relation(d_in, d_out) for m in self.measurements):
            raise AssertionError(
                "ParallelComposition member fails its own privacy relation "
                f"at d_in={d_in!r}, composed d_out={d_out!r}"
            )
        return d_out

    def __call__(self, data: List[Any]) -> List[Any]:
        """Answer every partition's measurement at once (this engine's
        non-interactive convenience form).  Restricted to
        non-interactive members: answering interactive members here
        would hand back a list of live queryables open SIMULTANEOUSLY,
        escaping the one-at-a-time serialization that
        :class:`ParallelQueryable` enforces (concurrent adaptive
        sessions across partitions are exactly what the reference's
        interactive form forbids, ``interactive_measurements.py:591``).
        Use :meth:`as_queryable` for interactive members.
        """
        if len(data) != len(self.measurements):
            raise ValueError("Partition count mismatch")
        for m in self.measurements:
            if m.is_interactive:
                raise ValueError(
                    "ParallelComposition.__call__ answers non-interactive "
                    "measurements only; use as_queryable() so interactive "
                    "partition sessions are opened one at a time"
                )
        return [m(d) for m, d in zip(self.measurements, data)]

    def as_queryable(self, data: List[Any]) -> "ParallelQueryable":
        """The reference's interactive form (its ParallelComposition
        returns a queryable rather than a list,
        ``interactive_measurements.py:719-721``): partitions are
        opened one at a time, strictly in index order, and opening
        the next retires the previous partition's whole session."""
        if len(data) != len(self.measurements):
            raise ValueError("Partition count mismatch")
        return ParallelQueryable(data, self.measurements)


class ParallelQueryable(Queryable):
    """Answers :class:`IndexQuery` on disjoint partitions in ascending
    index order (reference ``interactive_measurements.py:329-360``);
    opening partition ``i+1`` retires the queryable opened for ``i``
    and all its descendants."""

    def __init__(self, data: List[Any], measurements: Sequence[Measurement]):
        if len(data) != len(measurements):
            raise ValueError(
                "Length of input data does not match the number of "
                "measurements provided"
            )
        self._data = data
        self._measurements = list(measurements)
        self._next_index = 0
        self._current_queryable: Optional[RetirableQueryable] = None

    def __call__(self, query: IndexQuery) -> Any:
        if not isinstance(query, IndexQuery):
            raise TypeError("ParallelQueryable answers IndexQuery only")
        if query.index != self._next_index:
            raise ValueError("Bad Index")
        if self._current_queryable is not None:
            self._current_queryable(RetireQuery())
        self._next_index += 1
        answer = self._measurements[query.index](self._data[query.index])
        if not isinstance(answer, Queryable):
            # non-interactive partition measurement: its answer is
            # final, nothing to retire later
            self._current_queryable = None
            return answer
        self._current_queryable = RetirableQueryable(answer)
        return self._current_queryable


class AccountantState(Enum):
    ACTIVE = "active"
    WAITING_FOR_SIBLING = "waiting_for_sibling"
    WAITING_FOR_CHILDREN = "waiting_for_children"
    RETIRED = "retired"


#: Name-level parity alias: the reference spells this enum
#: ``PrivacyAccountantState`` (``interactive_measurements.py:769``), so
#: code ported from it imports the same name here.
PrivacyAccountantState = AccountantState


class InactiveAccountantError(RuntimeError):
    """Raised by :class:`PrivacyAccountant` operations that require
    the ACTIVE state (reference ``interactive_measurements.py:852``).
    Subclasses RuntimeError, so pre-existing ``except RuntimeError``
    handlers keep working."""


class PrivacyAccountant:
    """Budget ledger over private data with a sequential-adaptive
    lifecycle.  ``launch`` binds data; ``measure`` answers queries
    while deducting budget; ``split`` partitions into child
    accountants (budget counts once across disjoint partitions).

    Children enforce *sequential-adaptive* order (reference
    ``interactive_measurements.py:769-851``): only the first child of
    a ``split`` starts ACTIVE, the rest are WAITING_FOR_SIBLING and
    must be activated in list order — retiring child *i* activates
    child *i+1*; ``force_activate`` on child *j* retires every
    preceding sibling (and their descendants).  The parent resumes
    only when its last child retires."""

    def __init__(
        self,
        input_domain: Domain,
        input_metric: Metric,
        output_measure: Measure,
        d_in: Any,
        privacy_budget: PrivacyBudget,
        data: Any,
        _parent: Optional["PrivacyAccountant"] = None,
    ):
        self.input_domain = input_domain
        self.input_metric = input_metric
        self.output_measure = output_measure
        self.d_in = d_in
        self._budget = privacy_budget
        self._data = data
        self._state = (
            AccountantState.ACTIVE if _parent is None else AccountantState.WAITING_FOR_SIBLING
        )
        self._parent = _parent
        self._children: List[PrivacyAccountant] = []
        # transformations queued while not ACTIVE; domain/metric/d_in
        # already reflect them, the data application is deferred
        self._pending_transformations: List[Transformation] = []

    @classmethod
    def launch(
        cls, measurement: SequentialComposition, data: Any
    ) -> "PrivacyAccountant":
        measurement.input_domain.validate(data)
        return cls(
            measurement.input_domain,
            measurement.input_metric,
            measurement.output_measure,
            measurement.d_in,
            measurement.privacy_budget,
            data,
        )

    @property
    def state(self) -> AccountantState:
        return self._state

    @property
    def privacy_budget(self) -> PrivacyBudget:
        return self._budget

    @property
    def parent(self) -> Optional["PrivacyAccountant"]:
        """The accountant this one was split from (None for the root);
        reference ``interactive_measurements.py:975-981``."""
        return self._parent

    @property
    def children(self) -> List["PrivacyAccountant"]:
        """Accountants split from this one, in split order; reference
        ``interactive_measurements.py:983-989``."""
        return list(self._children)

    def _require_active(self) -> None:
        if self._state != AccountantState.ACTIVE:
            raise InactiveAccountantError(
                f"Accountant is {self._state.value}, not active"
            )

    def transform_in_place(
        self, transformation: Transformation, d_out: Any = None
    ) -> None:
        """Apply ``transformation`` to the private data in place.

        ``d_out``, when given, claims an output distance for the
        transformation at the accountant's current ``d_in``; it is
        validated against ``stability_relation`` and then used as the
        new ``d_in`` (reference ``interactive_measurements.py``
        transform_in_place d_out semantics — useful when the claimed
        bound is tighter than ``stability_function``'s generic one).
        """
        self._require_active()
        if transformation.input_domain != self.input_domain:
            raise ValueError("Transformation input domain does not match")
        if transformation.input_metric != self.input_metric:
            raise ValueError("Transformation input metric does not match")
        if d_out is not None and not transformation.stability_relation(
            self.d_in, d_out
        ):
            raise ValueError(
                f"Claimed d_out {d_out} does not satisfy the transformation's "
                f"stability relation at d_in {self.d_in}"
            )
        self._data = transformation(self._data)
        self.d_in = (
            d_out if d_out is not None
            else transformation.stability_function(self.d_in)
        )
        self.input_domain = transformation.output_domain
        self.input_metric = transformation.output_metric

    def queue_transformation(
        self, transformation: Transformation, d_out: Any = None
    ) -> None:
        """Queue ``transformation`` to run when this accountant becomes
        ACTIVE (reference ``interactive_measurements.py:1700-1800``).

        ACTIVE -> same as :meth:`transform_in_place`.  WAITING_* ->
        ``input_domain`` / ``input_metric`` / ``d_in`` update
        IMMEDIATELY (so further queued transformations chain against
        the pending output, and queries can be planned against the
        post-transformation shape), but the data application is
        deferred until activation.  Multiple transformations queue in
        order.  RETIRED -> RuntimeError.
        """
        if self._state == AccountantState.RETIRED:
            raise InactiveAccountantError(
                "Cannot queue transformations on a RETIRED accountant"
            )
        if self._state == AccountantState.ACTIVE:
            self.transform_in_place(transformation, d_out=d_out)
            return
        # self.input_domain/metric already reflect earlier queued
        # transformations, so validating against them chains correctly
        if transformation.input_domain != self.input_domain:
            raise ValueError(
                "Transformation input domain does not match the accountant's "
                "(pending) input domain"
            )
        if transformation.input_metric != self.input_metric:
            raise ValueError(
                "Transformation input metric does not match the accountant's "
                "(pending) input metric"
            )
        if d_out is not None and not transformation.stability_relation(
            self.d_in, d_out
        ):
            raise ValueError(
                f"Claimed d_out {d_out} does not satisfy the transformation's "
                f"stability relation at d_in {self.d_in}"
            )
        self._pending_transformations.append(transformation)
        self.d_in = (
            d_out if d_out is not None
            else transformation.stability_function(self.d_in)
        )
        self.input_domain = transformation.output_domain
        self.input_metric = transformation.output_metric

    def _become_active(self) -> None:
        """Set ACTIVE and run any transformations queued while waiting
        (domain/metric/d_in were already updated at queue time)."""
        self._state = AccountantState.ACTIVE
        while self._pending_transformations:
            self._data = self._pending_transformations.pop(0)(self._data)

    def measure(self, measurement: Measurement, d_out: Any = None) -> Any:
        """Answer a NON-interactive measurement, deducting its loss.

        ``d_out`` (optional): when the measurement implements
        ``privacy_function``, the claimed bound is validated against
        the function's answer and the (tighter) function answer is
        charged; when it does not (``NotImplementedError``), ``d_out``
        is required, validated via ``privacy_relation``, and charged —
        reference ``interactive_measurements.py:1196-1210``.
        """
        self._require_active()
        if measurement.is_interactive:
            raise ValueError(
                "PrivacyAccountant cannot answer interactive measurements: "
                "the returned queryable would live outside the accountant "
                "lifecycle (reference interactive_measurements.py:1285)"
            )
        if measurement.input_domain != self.input_domain:
            raise ValueError("Measurement input domain does not match")
        if measurement.input_metric != self.input_metric:
            raise ValueError("Measurement input metric does not match")
        if measurement.output_measure != self.output_measure:
            raise ValueError("Measurement output measure does not match")
        try:
            loss = measurement.privacy_function(self.d_in)
        except NotImplementedError:
            if d_out is None:
                raise ValueError(
                    "Measurement does not implement privacy_function; "
                    "pass d_out so the loss can be validated via "
                    "privacy_relation"
                ) from None
            if not measurement.privacy_relation(self.d_in, d_out):
                raise ValueError(
                    "Measurement's privacy relation cannot be satisfied "
                    f"with given d_out ({d_out})"
                ) from None
            loss = d_out
        else:
            if d_out is not None and not measurement.output_measure.compare(
                loss, d_out
            ):
                raise ValueError(
                    f"Measurement loss {loss} exceeds claimed {d_out}"
                )
        cost = _loss_to_budget(self.output_measure, loss)
        if not self._budget.can_spend(cost):
            raise InsufficientBudgetError(self._budget, cost)
        self._budget = self._budget.subtract(cost)
        return measurement(self._data)

    def split(
        self,
        partition_transformation: Transformation,
        privacy_budget: PrivacyBudget,
        d_out: Any = None,
    ) -> List["PrivacyAccountant"]:
        """Partition the data; children share one budget deduction.

        The partition transformation's output metric must be
        :class:`SumOf` when the output measure is PureDP/ApproxDP and
        :class:`RootSumOfSquared` when it is RhoZCDP — the pairs under
        which "disjoint partitions cost the max" is a theorem
        (reference ``interactive_measurements.py:1560-1570``); an
        off-grid pair silently under-charges.  Its output domain must
        be a fixed-length :class:`ListDomain` (a zero-length split
        would leave this accountant WAITING_FOR_CHILDREN forever).
        ``d_out`` (optional) claims the children's d_in; it is
        validated via ``stability_relation`` and preferred over
        ``stability_function`` when given.
        """
        from ..measures import PureDP, RhoZCDP

        self._require_active()
        if partition_transformation.input_domain != self.input_domain:
            raise ValueError("Partition input domain does not match")
        if partition_transformation.input_metric != self.input_metric:
            raise ValueError("Partition input metric does not match")
        out_domain = partition_transformation.output_domain
        if not isinstance(out_domain, ListDomain):
            raise ValueError("Partition transformation must output a ListDomain")
        if not out_domain.length:
            raise ValueError(
                "Partition transformation's output domain must declare a "
                "fixed, non-zero list length"
            )
        out_metric = partition_transformation.output_metric
        required = (
            RootSumOfSquared
            if isinstance(self.output_measure, RhoZCDP)
            else SumOf
        )
        # RootSumOfSquared subclasses SumOf: exact-type check required.
        if type(out_metric) is not required:
            raise ValueError(
                f"Partition transformation's output metric must be "
                f"{required.__name__} for output measure "
                f"{type(self.output_measure).__name__}, got "
                f"{type(out_metric).__name__}; any other pairing "
                "under-charges the split"
            )
        if d_out is not None:
            if not partition_transformation.stability_relation(self.d_in, d_out):
                raise ValueError(
                    f"Claimed d_out {d_out} does not satisfy the partition "
                    f"transformation's stability relation at d_in {self.d_in}"
                )
            child_d_in = d_out
        else:
            child_d_in = partition_transformation.stability_function(self.d_in)
        if not self._budget.can_spend(privacy_budget):
            raise InsufficientBudgetError(self._budget, privacy_budget)
        # Run the partition transformation (and its parts-length check)
        # BEFORE deducting the budget: a failing split must leave the
        # ledger unchanged rather than an ACTIVE accountant with the
        # budget spent and no children (r17).  No data has been
        # released at this point, so the un-deducted failure is sound.
        parts = partition_transformation(self._data)
        if len(parts) != out_domain.length:
            raise ValueError(
                f"Partition transformation produced {len(parts)} parts but "
                f"its output domain declares length {out_domain.length}"
            )
        self._budget = self._budget.subtract(privacy_budget)
        self._children = [
            PrivacyAccountant(
                out_domain.element_domain,
                out_metric.inner_metric,
                self.output_measure,
                child_d_in,
                privacy_budget,
                part,
                _parent=self,
            )
            for part in parts
        ]
        self._children[0]._become_active()
        self._state = AccountantState.WAITING_FOR_CHILDREN
        return self._children

    def force_activate(self) -> None:
        """Make this accountant ACTIVE, retiring whatever stands in the
        way: preceding siblings (if WAITING_FOR_SIBLING) or all
        descendants (if WAITING_FOR_CHILDREN).  Reference
        ``interactive_measurements.py:1615-1643``."""
        if self._state == AccountantState.RETIRED:
            raise RuntimeError("Cannot activate a RETIRED accountant")
        if self._state == AccountantState.ACTIVE:
            return
        if self._state == AccountantState.WAITING_FOR_CHILDREN:
            self._children[-1].retire(force=True)
        else:  # WAITING_FOR_SIBLING
            if self._parent is None:
                raise RuntimeError("WAITING_FOR_SIBLING accountant has no parent")
            self._parent._retire_preceding_siblings(self)

    def retire(self, force: bool = False) -> None:
        """Finish this accountant.

        Retiring the active child activates the next sibling (or the
        parent, after the last child).  Retiring a WAITING_FOR_SIBLING
        accountant first retires all preceding siblings (with a
        RuntimeWarning — it never performed an action); retiring a
        WAITING_FOR_CHILDREN accountant requires ``force`` and retires
        all descendants.  Reference
        ``interactive_measurements.py:1645-1707``.
        """
        import warnings

        if self._state == AccountantState.RETIRED:
            return
        if self._state == AccountantState.WAITING_FOR_CHILDREN and not force:
            raise RuntimeError(
                "Cannot retire an accountant that is WAITING_FOR_CHILDREN; "
                "pass force=True to retire it and all its descendants"
            )
        if self._state == AccountantState.WAITING_FOR_SIBLING:
            warnings.warn(
                "Retiring an unused accountant that is WAITING_FOR_SIBLING",
                RuntimeWarning,
            )
        if self._state != AccountantState.ACTIVE:
            # clears preceding siblings / descendants first
            self.force_activate()
        self._state = AccountantState.RETIRED
        if self._parent is not None:
            self._parent._activate_next(self)

    def _activate_next(self, child: "PrivacyAccountant") -> None:
        """Activate the sibling after ``child``, or resume self after
        the last child retires."""
        index = self._children.index(child)
        if index == len(self._children) - 1:
            self._become_active()
        else:
            self._children[index + 1]._become_active()

    def _retire_preceding_siblings(self, child: "PrivacyAccountant") -> None:
        index = self._children.index(child)
        if index == 0:
            raise RuntimeError("First child has no preceding siblings")
        self._children[index - 1].retire(force=True)


class MakeInteractive(Measurement):
    """Wrap a non-interactive measurement as an interactive one whose
    queryable answers it exactly once (reference
    ``interactive_measurements.py:724``)."""

    def __init__(self, measurement: Measurement):
        if measurement.is_interactive:
            raise ValueError("Measurement is already interactive")
        super().__init__(
            measurement.input_domain,
            measurement.input_metric,
            measurement.output_measure,
            is_interactive=True,
        )
        self.measurement = measurement

    def privacy_function(self, d_in: Any) -> Any:
        return self.measurement.privacy_function(d_in)

    def __call__(self, data: Any) -> "SingleUseQueryable":
        return SingleUseQueryable(self.measurement, data)


class SingleUseQueryable(Queryable):
    """Answers the wrapped measurement once, then refuses (the
    reference's GetAnswerQueryable, ``interactive_measurements.py:363``,
    answers ``None`` queries; the optional ``query`` argument keeps
    that calling form working alongside the zero-arg form)."""

    def __init__(self, measurement: Measurement, data: Any):
        self._measurement = measurement
        self._data = data
        self._used = False

    def __call__(self, query: Any = None) -> Any:
        if self._used:
            raise RuntimeError("Queryable already answered its measurement")
        self._used = True
        result = self._measurement(self._data)
        self._data = None
        return result


class DecorateQueryable(Measurement):
    """Post-process the queryable created by an interactive measurement
    (reference ``interactive_measurements.py:413``)."""

    def __init__(self, measurement: Measurement, preprocess_query, postprocess_answer):
        if not measurement.is_interactive:
            raise ValueError("DecorateQueryable requires an interactive measurement")
        super().__init__(
            measurement.input_domain,
            measurement.input_metric,
            measurement.output_measure,
            is_interactive=True,
        )
        self.measurement = measurement
        self.preprocess_query = preprocess_query
        self.postprocess_answer = postprocess_answer

    def privacy_function(self, d_in: Any) -> Any:
        return self.measurement.privacy_function(d_in)

    def __call__(self, data: Any) -> "DecoratedQueryable":
        return DecoratedQueryable(
            self.measurement(data), self.preprocess_query, self.postprocess_answer
        )


class DecoratedQueryable(Queryable):
    """Applies ``preprocess_query`` / ``postprocess_answer`` around an
    inner queryable (reference ``interactive_measurements.py:378``)."""

    def __init__(self, inner: Any, preprocess_query, postprocess_answer):
        self._inner = inner
        self._pre = preprocess_query
        self._post = postprocess_answer

    def __call__(self, query: Any) -> Any:
        return self._post(self._inner(self._pre(query)))


def create_adaptive_composition(
    input_domain: Domain,
    input_metric: Metric,
    d_in: Any,
    privacy_budget: PrivacyBudget,
    output_measure: Measure,
) -> DecorateQueryable:
    """An interactive measurement whose queryable answers
    NON-interactive :class:`MeasurementQuery`\\ s and
    :class:`TransformationQuery`\\ s directly, deducting from one
    shared budget (reference ``interactive_measurements.py:1856``).

    This is :class:`SequentialComposition` decorated both ways:
    queries-in are wrapped in :class:`MakeInteractive` (the sequential
    queryable only opens interactive sessions), and queryable-answers
    are immediately consumed so the caller sees the plain measurement
    result instead of a one-shot queryable.
    """

    def preprocess_query(query: Any) -> Any:
        if isinstance(query, MeasurementQuery):
            if query.measurement.is_interactive:
                raise ValueError("Cannot answer interactive measurement query.")
            return MeasurementQuery(
                MakeInteractive(query.measurement), d_out=query.d_out
            )
        if isinstance(query, TransformationQuery):
            return query
        raise TypeError(
            "create_adaptive_composition answers MeasurementQuery and "
            f"TransformationQuery, got {type(query).__name__}"
        )

    def postprocess_answer(answer: Any) -> Any:
        if isinstance(answer, Queryable):
            return answer(None)
        return answer

    return DecorateQueryable(
        measurement=SequentialComposition(
            input_domain=input_domain,
            input_metric=input_metric,
            output_measure=output_measure,
            d_in=d_in,
            privacy_budget=privacy_budget,
        ),
        preprocess_query=preprocess_query,
        postprocess_answer=postprocess_answer,
    )
