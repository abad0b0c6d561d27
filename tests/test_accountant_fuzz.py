"""Randomized lifecycle/budget-invariant fuzz of the PrivacyAccountant
tree (r16; r17 extends it across all three budget measures).

A hypothesis-driven random walk issues measure / transform / queue /
split / retire / force_activate / mismatch operations against random
accountants in the tree, entirely driver-side (numpy scalar domain,
geometric mechanism — no Spark).  The ported reference conformance
scenarios in test_measurements2 pin KNOWN orderings; this fuzz hunts
orderings nobody wrote down.  r17 parametrizes the whole walk over
PureDP, ApproxDP, and RhoZCDP (delta-composition and rho arithmetic are
where silent under-charging hides: the zCDP walk splits under
RootSumOfSquared and charges eps^2/2 losses), and adds adversarial
"mismatch" steps — a wrong-measure measurement, a wrong-metric split,
and a partition transformation that lies about its part count — each of
which must raise and leave the ledger AND the state machine untouched.
Invariants checked after every step:

* a successful ``measure`` deducts exactly its privacy_function cost
  (componentwise for ApproxDP) and never drives the budget negative;
* budget-exceeding queries raise ``InsufficientBudgetError`` and
  deduct NOTHING (failed-query atomicity);
* rejected mismatches (wrong measure / wrong split metric / lying part
  count) raise ``ValueError`` and change neither budget nor state —
  the lying-split case exercises the r17 run-before-deduct ordering
  under every measure;
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

from tumult_core_spark.base import Measurement, Transformation
from tumult_core_spark.domains import ListDomain, NumpyIntegerDomain
from tumult_core_spark.exact_number import ExactNumber
from tumult_core_spark.measures import (
    ApproxDP,
    ApproxDPBudget,
    InsufficientBudgetError,
    PureDP,
    PureDPBudget,
    RhoZCDP,
    RhoZCDPBudget,
)
from tumult_core_spark.measurements.converters import (
    PureDPToApproxDP,
    PureDPToRhoZCDP,
)
from tumult_core_spark.measurements.interactive import (
    AccountantState,
    InactiveAccountantError,
    PrivacyAccountant,
    SequentialComposition,
)
from tumult_core_spark.measurements.noise import AddGeometricNoise
from tumult_core_spark.metrics import (
    AbsoluteDifference,
    RootSumOfSquared,
    SumOf,
)

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
    """Scalar -> [floor(x/2), ceil(x/2)] disjoint 'partition'.

    ``use_l2`` picks the output metric wrapper: SumOf for PureDP /
    ApproxDP splits, RootSumOfSquared for RhoZCDP splits (the only
    pairs the accountant's split grid admits).
    """

    def __init__(self, use_l2: bool = False, declared_length: int = 2):
        wrap = RootSumOfSquared if use_l2 else SumOf
        super().__init__(
            DOM, MET, ListDomain(DOM, length=declared_length), wrap(MET)
        )

    def stability_function(self, d_in):
        return ExactNumber(d_in)

    def __call__(self, data):
        lo = np.int64(int(data) // 2)
        return [lo, np.int64(int(data) - int(lo))]


def cost_measurement(kind: str, cost: int) -> Measurement:
    """A measurement denominated in ``kind``'s measure whose loss at
    d_in=1 is exactly: eps=cost (pure), (cost, 0) (approx), or
    cost^2/2 (zcdp, via the eps-DP => eps^2/2-zCDP conversion)."""
    base = AddGeometricNoise(ExactNumber(1) / cost)
    if kind == "pure":
        return base
    if kind == "approx":
        return PureDPToApproxDP(base)
    return PureDPToRhoZCDP(base)


_CASES = {
    # kind -> (measure, root budget, per-split budget, use_l2 split)
    "pure": (PureDP(), PureDPBudget(INITIAL), PureDPBudget(1), False),
    "approx": (
        ApproxDP(),
        ApproxDPBudget(INITIAL, "1/100"),
        ApproxDPBudget(1, "1/1000"),
        False,
    ),
    "zcdp": (RhoZCDP(), RhoZCDPBudget(INITIAL), RhoZCDPBudget(1), True),
}


def _vals(budget) -> tuple:
    """Budget value as a tuple of ExactNumbers, uniform across measures
    (ApproxDP is (eps, delta); the scalar measures become 1-tuples)."""
    v = budget.value
    return tuple(ExactNumber(x) for x in v) if isinstance(v, tuple) else (
        ExactNumber(v),
    )


def _loss_vals(kind: str, loss) -> tuple:
    return (
        tuple(ExactNumber(x) for x in loss)
        if kind == "approx"
        else (ExactNumber(loss),)
    )


OPS = st.lists(
    st.tuples(
        st.sampled_from(
            [
                "measure",
                "measure_claimed",
                "transform",
                "transform_claimed",
                "queue",
                "split",
                "retire",
                "force",
                "mismatch_measure",
                "mismatch_split_metric",
                "mismatch_split_count",
            ]
        ),
        st.integers(min_value=0, max_value=100),  # accountant picker
        st.integers(min_value=1, max_value=4),    # measure cost
    ),
    min_size=1,
    max_size=25,
)


class TestAccountantFuzz:
    @settings(max_examples=120, deadline=None)
    @pytest.mark.parametrize("kind", ["pure", "approx", "zcdp"])
    @given(ops=OPS)
    def test_random_walk_invariants(self, kind, ops):
        measure, root_budget, split_budget, use_l2 = _CASES[kind]
        root = PrivacyAccountant.launch(
            SequentialComposition(
                DOM, MET, measure, d_in=1, privacy_budget=root_budget
            ),
            np.int64(40),
        )
        tree = [root]
        initial_vals = _vals(root.privacy_budget)

        def check_global():
            active = [a for a in tree if a.state == AccountantState.ACTIVE]
            assert len(active) <= 1, "two accountants ACTIVE at once"
            for a in tree:
                assert all(v >= 0 for v in _vals(a.privacy_budget))

        for op, pick, cost in ops:
            acct = tree[pick % len(tree)]
            before = _vals(acct.privacy_budget)
            state_before = acct.state
            try:
                if op == "measure":
                    # d_in through any queued/applied transforms stays 1
                    # (AddOne is stability-1), so the cost claim holds
                    if acct.input_domain != DOM:
                        continue
                    m = cost_measurement(kind, cost)
                    expected = _loss_vals(
                        kind, m.privacy_function(acct.d_in)
                    )
                    acct.measure(m)
                    assert acct.state == AccountantState.ACTIVE
                    after = _vals(acct.privacy_budget)
                    assert after == tuple(
                        b - e for b, e in zip(before, expected)
                    ), f"{kind} measure deducted wrong amount"
                elif op == "measure_claimed":
                    # the claimed-d_out form: a too-tight claim is
                    # rejected with nothing deducted; an exact claim is
                    # accepted and charges the function answer
                    if acct.input_domain != DOM:
                        continue
                    m = cost_measurement(kind, cost)
                    loss = m.privacy_function(acct.d_in)
                    tight = (
                        (ExactNumber(loss[0]) / 2, loss[1])
                        if kind == "approx"
                        else ExactNumber(loss) / 2
                    )
                    with pytest.raises(ValueError, match="exceeds claimed"):
                        acct.measure(m, d_out=tight)
                    assert _vals(acct.privacy_budget) == before
                    expected = _loss_vals(kind, loss)
                    acct.measure(m, d_out=loss)
                    after = _vals(acct.privacy_budget)
                    assert after == tuple(
                        b - e for b, e in zip(before, expected)
                    )
                elif op == "transform":
                    acct.transform_in_place(AddOne())
                    assert _vals(acct.privacy_budget) == before
                elif op == "transform_claimed":
                    # a d_out claim tighter than the stability function
                    # is rejected BEFORE the data mutates; the exact
                    # claim is accepted and costs nothing
                    if acct.input_domain != DOM:
                        continue
                    d_before = acct.d_in
                    with pytest.raises(ValueError, match="stability relation"):
                        acct.transform_in_place(
                            AddOne(), d_out=ExactNumber(acct.d_in) / 2
                        )
                    assert acct.d_in == d_before
                    acct.transform_in_place(AddOne(), d_out=d_before)
                    assert acct.d_in == d_before
                    assert _vals(acct.privacy_budget) == before
                elif op == "queue":
                    acct.queue_transformation(AddOne())
                    assert _vals(acct.privacy_budget) == before
                elif op == "split":
                    children = acct.split(SplitTwo(use_l2), split_budget)
                    spent = _vals(split_budget)
                    assert _vals(acct.privacy_budget) == tuple(
                        b - s for b, s in zip(before, spent)
                    )
                    assert acct.state == AccountantState.WAITING_FOR_CHILDREN
                    assert children[0].state == AccountantState.ACTIVE
                    assert (
                        children[1].state == AccountantState.WAITING_FOR_SIBLING
                    )
                    assert all(
                        _vals(c.privacy_budget) == spent for c in children
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
                elif op == "mismatch_measure":
                    # a measurement denominated in the WRONG measure
                    # must be rejected with nothing deducted
                    if acct.input_domain != DOM:
                        continue
                    wrong_kind = "approx" if kind != "approx" else "pure"
                    with pytest.raises(ValueError, match="measure"):
                        acct.measure(cost_measurement(wrong_kind, cost))
                    assert _vals(acct.privacy_budget) == before
                    assert acct.state == state_before
                elif op == "mismatch_split_metric":
                    # off-grid split metric (L2 under PureDP/ApproxDP,
                    # L1 under zCDP) under-charges — rejected, no deduct
                    if acct.input_domain != DOM:
                        continue
                    with pytest.raises(ValueError, match="metric"):
                        acct.split(SplitTwo(not use_l2), split_budget)
                    assert _vals(acct.privacy_budget) == before
                    assert acct.state == state_before
                elif op == "mismatch_split_count":
                    # the partition transformation LIES about its part
                    # count: the r17 run-before-deduct ordering means
                    # the failure leaves the ledger and state untouched
                    if acct.input_domain != DOM:
                        continue
                    if not acct.privacy_budget.can_spend(split_budget):
                        # would raise InsufficientBudgetError (also a
                        # ValueError) before reaching the parts check
                        continue
                    with pytest.raises(ValueError, match="parts"):
                        acct.split(
                            SplitTwo(use_l2, declared_length=3), split_budget
                        )
                    assert _vals(acct.privacy_budget) == before
                    assert acct.state == state_before
            except InactiveAccountantError:
                # rejected for state reasons: nothing may have changed
                assert _vals(acct.privacy_budget) == before
                assert acct.state == state_before
            except InsufficientBudgetError:
                # rejected for budget reasons: nothing deducted
                assert _vals(acct.privacy_budget) == before
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
            assert all(v >= 0 for v in _vals(a.privacy_budget))
        assert all(v >= 0 for v in initial_vals)  # root budget well-formed


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
