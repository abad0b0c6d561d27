"""Property-based tests (hypothesis) for the exact-arithmetic layer —
the stability/privacy math must never lose precision."""

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from tumult_core_spark.exact_number import ExactNumber
from tumult_core_spark.measures import ApproxDPBudget, PureDPBudget
from tumult_core_spark.utils.parameters import calculate_noise_scale
from tumult_core_spark.measures import PureDP, RhoZCDP

fractions = st.fractions(
    min_value=Fraction(-1000), max_value=Fraction(1000), max_denominator=1000
)
pos_fractions = st.fractions(
    min_value=Fraction(1, 1000), max_value=Fraction(1000), max_denominator=1000
)


@settings(max_examples=200, deadline=None)
@given(fractions, fractions)
def test_addition_is_exact(a, b):
    assert ExactNumber(a) + ExactNumber(b) == ExactNumber(a + b)


@settings(max_examples=200, deadline=None)
@given(fractions, pos_fractions)
def test_division_roundtrips(a, b):
    x = ExactNumber(a) / ExactNumber(b)
    assert x * ExactNumber(b) == ExactNumber(a)


@settings(max_examples=200, deadline=None)
@given(pos_fractions)
def test_sqrt_squares_back(a):
    assert ExactNumber(a).sqrt() ** 2 == ExactNumber(a)


@settings(max_examples=200, deadline=None)
@given(pos_fractions)
def test_to_float_brackets_value(a):
    x = ExactNumber(a)
    assert x.to_float(round_up=False) <= float(a) <= x.to_float(round_up=True)


@settings(max_examples=100, deadline=None)
@given(pos_fractions, pos_fractions)
def test_budget_subtract_then_add(total, spend):
    if spend > total:
        return
    b = PureDPBudget(total)
    rest = b.subtract(PureDPBudget(spend))
    assert rest.value + ExactNumber(spend) == ExactNumber(total)


@settings(max_examples=100, deadline=None)
@given(pos_fractions, pos_fractions)
def test_noise_scale_inverts_puredp(d_in, eps):
    scale = calculate_noise_scale(Fraction(d_in), Fraction(eps), PureDP())
    # mechanism guarantee: eps_actual = d_in / scale == requested
    assert ExactNumber(Fraction(d_in)) / scale == ExactNumber(Fraction(eps))


@settings(max_examples=100, deadline=None)
@given(pos_fractions, pos_fractions)
def test_noise_scale_inverts_zcdp(d_in, rho):
    s2 = calculate_noise_scale(Fraction(d_in), Fraction(rho), RhoZCDP())
    assert ExactNumber(Fraction(d_in)) ** 2 / (s2 * 2) == ExactNumber(Fraction(rho))
