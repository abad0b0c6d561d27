"""Randomized lifecycle/budget-invariant fuzz of the PrivacyAccountant
tree (r16).

A hypothesis-driven random walk issues measure / transform / queue /
split / retire / force_activate operations against random accountants
in the tree, entirely driver-side (numpy scalar domain, geometric
mechanism — no Spark).  The ported reference conformance scenarios in
test_measurements2 pin KNOWN orderings; this fuzz hunts orderings
nobody wrote down.  Invariants checked after every step:

* a successful ``measure`` deducts exactly its privacy_function cost
  and never drives the budget negative;
* budget-exceeding queries raise ``InsufficientBudgetError`` and
  deduct NOTHING (failed-query atomicity);
* actions on non-ACTIVE accountants raise ``InactiveAccountantError``
  and change no state;
* at most one accountant in the whole tree is ACTIVE at any time
  (the sequential-adaptive guarantee, the structural core of the
  composition theorem);
* ``split`` deducts once, children start first-ACTIVE /
  rest-WAITING_FOR_SIBLING, and the parent resumes ACTIVE exactly when
  its last child retires;
* queued transformations update d_in/domain immediately but apply to
  the data only on activation.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tumult_core_spark.base import Transformation
from tumult_core_spark.domains import ListDomain, NumpyIntegerDomain
from tumult_core_spark.exact_number import ExactNumber
from tumult_core_spark.measures import (
    InsufficientBudgetError,
    PureDP,
    PureDPBudget,
)
from tumult_core_spark.measurements.interactive import (
    AccountantState,
    InactiveAccountantError,
    PrivacyAccountant,
    SequentialComposition,
)
from tumult_core_spark.measurements.noise import AddGeometricNoise
from tumult_core_spark.metrics import AbsoluteDifference, SumOf

DOM = NumpyIntegerDomain()
MET = AbsoluteDifference()
INITIAL = 8


class AddOne(Transformation):
    """Stability-1 scalar transformation (data + 1)."""

    def __init__(self):
        super().__init__(DOM, MET, DOM, MET)

    def stability_function(self, d_in):
        return ExactNumber(d_in)

    def __call__(self, data):
        return np.int64(data + 1)


class SplitTwo(Transformation):
    """Scalar -> [floor(x/2), ceil(x/2)] disjoint 'partition'."""

    def __init__(self):
        super().__init__(
            DOM, MET, ListDomain(DOM, length=2), SumOf(MET)
        )

    def stability_function(self, d_in):
        return ExactNumber(d_in)

    def __call__(self, data):
        lo = np.int64(int(data) // 2)
        return [lo, np.int64(int(data) - int(lo))]


def cost_measurement(cost: int):
    """A measurement whose privacy_function(1) == cost exactly."""
    return AddGeometricNoise(ExactNumber(1) / cost)


OPS = st.lists(
    st.tuples(
        st.sampled_from(
            ["measure", "transform", "queue", "split", "retire", "force"]
        ),
        st.integers(min_value=0, max_value=100),  # accountant picker
        st.integers(min_value=1, max_value=4),    # measure cost
    ),
    min_size=1,
    max_size=25,
)


class TestAccountantFuzz:
    @settings(max_examples=120, deadline=None)
    @given(ops=OPS)
    def test_random_walk_invariants(self, ops):
        root = PrivacyAccountant.launch(
            SequentialComposition(
                DOM, MET, PureDP(), d_in=1,
                privacy_budget=PureDPBudget(INITIAL),
            ),
            np.int64(40),
        )
        tree = [root]

        def check_global():
            active = [a for a in tree if a.state == AccountantState.ACTIVE]
            assert len(active) <= 1, "two accountants ACTIVE at once"
            for a in tree:
                assert a.privacy_budget.value >= 0

        for op, pick, cost in ops:
            acct = tree[pick % len(tree)]
            before = acct.privacy_budget.value
            state_before = acct.state
            try:
                if op == "measure":
                    # d_in through any queued/applied transforms stays 1
                    # (AddOne is stability-1), so the cost claim holds
                    m = cost_measurement(cost)
                    if acct.input_domain != DOM:
                        continue
                    acct.measure(m)
                    assert acct.state == AccountantState.ACTIVE
                    assert (
                        acct.privacy_budget.value
                        == before - acct.d_in * cost
                    )
                elif op == "transform":
                    acct.transform_in_place(AddOne())
                    assert acct.privacy_budget.value == before
                elif op == "queue":
                    acct.queue_transformation(AddOne())
                    assert acct.privacy_budget.value == before
                elif op == "split":
                    children = acct.split(SplitTwo(), PureDPBudget(1))
                    assert acct.privacy_budget.value == before - 1
                    assert acct.state == AccountantState.WAITING_FOR_CHILDREN
                    assert children[0].state == AccountantState.ACTIVE
                    assert (
                        children[1].state == AccountantState.WAITING_FOR_SIBLING
                    )
                    assert all(
                        c.privacy_budget.value == 1 for c in children
                    )
                    tree.extend(children)
                elif op == "retire":
                    was_waiting_children = (
                        acct.state == AccountantState.WAITING_FOR_CHILDREN
                    )
                    with pytest.warns(RuntimeWarning) if (
                        acct.state == AccountantState.WAITING_FOR_SIBLING
                    ) else _nullcontext():
                        acct.retire(force=was_waiting_children)
                    assert acct.state == AccountantState.RETIRED
                    # parent of a last-retiring child resumes ACTIVE
                    p = acct.parent
                    if p is not None and all(
                        c.state == AccountantState.RETIRED for c in p.children
                    ) and p.state != AccountantState.RETIRED:
                        assert p.state == AccountantState.ACTIVE
                elif op == "force":
                    if acct.state == AccountantState.RETIRED:
                        with pytest.raises(RuntimeError):
                            acct.force_activate()
                    else:
                        acct.force_activate()
                        assert acct.state == AccountantState.ACTIVE
            except InactiveAccountantError:
                # rejected for state reasons: nothing may have changed
                assert acct.privacy_budget.value == before
                assert acct.state == state_before
            except InsufficientBudgetError:
                # rejected for budget reasons: nothing deducted
                assert acct.privacy_budget.value == before
            except RuntimeWarning:
                pass
            check_global()

        # drain: retire everything still live, leaves first; ledger holds
        for a in reversed(tree):
            if a.state != AccountantState.RETIRED:
                import warnings

                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    a.retire(force=True)
        for a in tree:
            assert a.state == AccountantState.RETIRED
            assert 0 <= a.privacy_budget.value <= INITIAL


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
