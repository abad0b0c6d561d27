"""Property-based tests (hypothesis) for the exact-arithmetic layer —
the stability/privacy math must never lose precision."""

from fractions import Fraction

import pytest
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


@settings(max_examples=50, deadline=None)
@given(pos_fractions, pos_fractions)
def test_bun_steinke_radical_comparison(eps, delta_inv):
    """The delta>0 routing identity: rho = (sqrt(L+eps)-sqrt(L))^2 with
    L = ln(1/delta) converts back to exactly eps — exercises the
    ExactNumber comparison fallback on nested radicals."""
    import sympy as sp

    L = sp.log(1 + delta_inv)  # any positive L works for the identity
    e = sp.Rational(eps)
    rho = (sp.sqrt(L + e) - sp.sqrt(L)) ** 2
    back = ExactNumber(rho + 2 * sp.sqrt(rho * L))
    target = ExactNumber(sp.Rational(eps))
    assert back <= target
    assert back >= target
    assert not back < target


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=(1 << 53) - 1),
       st.fractions(min_value=Fraction(1, 4), max_value=Fraction(50),
                    max_denominator=64))
def test_resolve_band_index_in_enclosure(m, scale):
    """The rigorous fallback's band index always lies inside the
    high-precision enclosure of floor(-scale ln u) over the prefix."""
    import mpmath

    from tumult_core_spark import samplers

    r = samplers._resolve_band_index(m, 53, scale)
    with mpmath.workprec(200):
        s = mpmath.mpf(scale.numerator) / mpmath.mpf(scale.denominator)
        a = -mpmath.log(mpmath.mpf(m) / 2**53) * s
        b = -mpmath.log((mpmath.mpf(m) + 1) / 2**53) * s
    assert int(mpmath.floor(b)) <= r <= int(mpmath.floor(a))


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=9), st.integers(min_value=1, max_value=9),
       st.randoms(use_true_random=False))
def test_ppm_bmp_decode_roundtrip(w, h, rnd):
    """Random pixels encoded as PPM and BMP decode back bit-identically
    (incl. BMP bottom-up row order and 4-byte row padding)."""
    import struct

    import numpy as np

    from tumult_core_spark.extensions.multimodal import _decode_bmp, _decode_pnm

    img = np.array(
        [[[rnd.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)],
        dtype=np.uint8,
    )
    ppm = f"P6\n{w} {h}\n255\n".encode() + img.tobytes()
    out = _decode_pnm(ppm)
    assert out is not None and (out == img).all()

    pad = b"\x00" * ((-w * 3) % 4)
    rows = b"".join(img[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1))
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
        + rows
    )
    out2 = _decode_bmp(bmp)
    assert out2 is not None and (out2 == img).all()


# ---------------------------------------------------------------------------
# Double-double kernels (the certified continuous-sampler arithmetic):
# every kernel must stay inside the 2^-88 error budget the sampler
# certification margins assume, across the kernels' full input domains.
# ---------------------------------------------------------------------------

_DD_BUDGET = 2.0**-88


def _dd_rel_err(dd_pair, i, true, mpmath):
    got = mpmath.mpf(float(dd_pair[0][i])) + mpmath.mpf(float(dd_pair[1][i]))
    denom = max(abs(true), mpmath.mpf("1e-300"))
    return abs((got - true) / denom)


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=-670.0, max_value=700.0, allow_nan=False))
def test_dd_exp_within_budget(z):
    import mpmath
    import numpy as np

    from tumult_core_spark import dd

    with mpmath.workprec(200):
        e = dd.exp_d(np.array([z]))
        true = mpmath.exp(mpmath.mpf(z))
        assert _dd_rel_err(e, 0, true, mpmath) < _DD_BUDGET


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=2.0**-106, max_value=1.0, allow_nan=False))
def test_dd_log_within_budget(a):
    # the samplers' log domain: dd values in (0, 1] (uniform prefixes)
    import mpmath
    import numpy as np

    from tumult_core_spark import dd

    with mpmath.workprec(200):
        l = dd.log((np.array([a]), np.array([0.0])))
        true = mpmath.log(mpmath.mpf(a))
        got = mpmath.mpf(float(l[0][0])) + mpmath.mpf(float(l[1][0]))
        # absolute error vs |log| (log(1)=0 makes pure relative unusable)
        assert abs(got - true) < _DD_BUDGET * max(abs(true), 1.0)


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=0.0, max_value=6.2831853071795865, allow_nan=False))
def test_dd_sincos_within_budget(x):
    import mpmath
    import numpy as np

    from tumult_core_spark import dd

    with mpmath.workprec(200):
        s, c = dd.sincos((np.array([x]), np.array([0.0])))
        ts, tc = mpmath.sin(mpmath.mpf(x)), mpmath.cos(mpmath.mpf(x))
        gs = mpmath.mpf(float(s[0][0])) + mpmath.mpf(float(s[1][0]))
        gc = mpmath.mpf(float(c[0][0])) + mpmath.mpf(float(c[1][0]))
        assert abs(gs - ts) < _DD_BUDGET  # absolute: |sin|,|cos| <= 1
        assert abs(gc - tc) < _DD_BUDGET


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=1e-290, max_value=1e290, allow_nan=False))
def test_dd_sqrt_within_budget(a):
    # normal-range domain: near subnormals the EFT legs underflow and
    # the samplers route through the scalar loop (_EXTREME_SCALE)
    import mpmath
    import numpy as np

    from tumult_core_spark import dd

    with mpmath.workprec(200):
        s = dd.sqrt((np.array([a]), np.array([0.0])))
        true = mpmath.sqrt(mpmath.mpf(a))
        assert _dd_rel_err(s, 0, true, mpmath) < _DD_BUDGET


# ---------------------------------------------------------------------------
# Hash sampling/splitting arithmetic (driver-side replica of the
# Catalyst expressions — same Knuth multiplicative mix)
# ---------------------------------------------------------------------------


def _ks(seed):
    # per-seed odd multiplier: different seeds are different affine
    # permutations, not translations (see sampling._mix)
    return (2654435761 * (2 * seed + 1)) % (1 << 32)


def _mix_py(i, seed):
    # reference value: the mathematical K_s*(i+seed) mod 2^32
    return (((i % (1 << 32)) + (seed % (1 << 32))) * _ks(seed)) % (1 << 32)


def _mix_split_py(i, seed):
    # the engine's split-multiply form: every intermediate < 2^48
    k = _ks(seed)
    m = ((i % (1 << 32)) + (seed % (1 << 32))) % (1 << 32)
    lo, hi = m % 65536, m // 65536
    inter = [k * hi, (k * hi % 65536) * 65536 + k * lo]
    assert all(v < 2**63 for v in inter)
    return inter[1] % (1 << 32)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**63 - 1_000_001),
    st.integers(min_value=0, max_value=1_000_000),
)
def test_mix_split_matches_reference_full_int64_range(i, seed):
    # the overflow-free split multiply must equal K*(i+seed) mod 2^32
    # for the ENTIRE non-negative int64 id range (a plain product
    # overflows beyond i ~3.4e9 under ANSI mode)
    assert _mix_split_py(i, seed) == _mix_py(i, seed)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_split_intervals_partition_hash_space(i):
    # consecutive-interval assignment: exactly one split matches, and
    # nested fractions produce nested sample sets
    pos = _mix_split_py(i, 0)
    bounds = [int(0.8 * 2**32), int(0.9 * 2**32)]
    name = "train" if pos < bounds[0] else "val" if pos < bounds[1] else "test"
    assert name in ("train", "val", "test")
    in_20 = pos < int(0.2 * 2**32)
    in_50 = pos < int(0.5 * 2**32)
    assert not in_20 or in_50  # sample(0.2) subset of sample(0.5)


# ---------------------------------------------------------------------------
# temperature mixing thresholds (pure function; used by temperature_mix)
# ---------------------------------------------------------------------------

source_counts = st.dictionaries(
    st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=5),
    st.integers(min_value=1, max_value=10**9),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(source_counts, st.floats(min_value=0.1, max_value=100.0))
def test_temperature_thresholds_properties(counts, temperature):
    from tumult_core_spark.extensions.sampling import _MOD, temperature_thresholds

    t = temperature_thresholds(counts, temperature)
    assert set(t) == set(counts)
    # thresholds are valid hash bounds and at least one source is kept whole
    assert all(0 <= v <= _MOD for v in t.values())
    assert max(t.values()) == _MOD
    if temperature >= 1.0:
        # flattening: rarer sources never get a smaller keep-rate
        for a in counts:
            for b in counts:
                if counts[a] <= counts[b]:
                    assert t[a] >= t[b]


@settings(max_examples=200, deadline=None)
@given(source_counts)
def test_temperature_one_keeps_everything(counts):
    from tumult_core_spark.extensions.sampling import _MOD, temperature_thresholds

    assert set(temperature_thresholds(counts, 1.0).values()) == {_MOD}


@pytest.mark.slow  # random-JSON roundtrip fuzz: full lane only
class TestJsonExtractionProperty:
    """Property: for any flat dict of typed values, json.dumps ->
    extract_json_fields round-trips every field (Catalyst JSON parsing
    agrees with Python's encoder)."""

    @given(
        st.dictionaries(
            # keys: lowercase identifier-ish (Spark column resolution is
            # case-insensitive and JSONPath dislikes leading digits)
            st.from_regex(r"[a-z][a-z0-9]{0,7}", fullmatch=True),
            st.one_of(
                st.integers(min_value=-(2**53), max_value=2**53),
                st.text(max_size=20),
                st.booleans(),
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=20, deadline=None)
    def test_roundtrip(self, payload):
        import json

        from tumult_core_spark.extensions.semistructured import (
            extract_json_fields,
        )
        from tumult_core_spark.utils.misc import get_spark

        spark = get_spark("prop-json", cpus=2)
        df = spark.createDataFrame([(json.dumps(payload),)], "j string")
        fields = {}
        for k, v in payload.items():
            if isinstance(v, bool):
                fields[f"f_{k}"] = (f"$.{k}", "boolean")
            elif isinstance(v, int):
                fields[f"f_{k}"] = (f"$.{k}", "long")
            else:
                fields[f"f_{k}"] = f"$.{k}"
        row = extract_json_fields(df, "j", fields).first()
        for k, v in payload.items():
            assert row[f"f_{k}"] == v, (k, v, row[f"f_{k}"])


@pytest.mark.slow  # stability fuzz: full lane only
class TestTruncationStabilityFuzz:
    """Randomized empirical stability for the truncation family: on
    random small datasets and thresholds, a random single-row-removal
    neighbor must keep the metric-correct output distance within the
    claimed stability. Hash-ordered truncation is where adversarial
    orderings would hide, so it gets the fuzzing."""

    @staticmethod
    def _distance(metric, rows_a, rows_b, cols):
        import math as _math
        from collections import Counter

        from tumult_core_spark.metrics import (
            IfGroupedBy,
            RootSumOfSquared,
            SumOf,
            SymmetricDifference,
        )

        dist = TestTruncationStabilityFuzz._distance
        if isinstance(metric, SymmetricDifference):
            ca, cb = Counter(rows_a), Counter(rows_b)
            return sum((ca - cb).values()) + sum((cb - ca).values())
        if isinstance(metric, IfGroupedBy):
            idx = cols.index(metric.column)
            groups = {}
            for r in rows_a:
                groups.setdefault(r[idx], ([], []))[0].append(r)
            for r in rows_b:
                groups.setdefault(r[idx], ([], []))[1].append(r)
            inner = metric.inner_metric
            if isinstance(inner, SymmetricDifference):
                d = 0
                for ga, gb in groups.values():
                    if Counter(ga) != Counter(gb):
                        d += 1 if (not ga or not gb) else 2
                return d
            parts = [
                dist(inner.inner_metric, ga, gb, cols)
                for ga, gb in groups.values()
            ]
            if isinstance(inner, RootSumOfSquared):
                return _math.sqrt(sum(p * p for p in parts))
            return sum(parts)
        raise NotImplementedError(repr(metric))

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=4),
            ),
            min_size=2,
            max_size=12,
        ),
        threshold=st.integers(min_value=1, max_value=3),
        drop_idx=st.integers(min_value=0, max_value=11),
        op=st.sampled_from(
            ["limit_rows", "limit_keys", "limit_rows_per_key", "lrpk_nested"]
        ),
    )
    @settings(max_examples=12, deadline=None)
    def test_random_neighbors(self, rows, threshold, drop_idx, op):
        from tumult_core_spark.domains import (
            SparkDataFrameDomain,
            SparkIntegerColumnDescriptor,
        )
        from tumult_core_spark.metrics import (
            IfGroupedBy,
            SumOf,
            SymmetricDifference,
        )
        from tumult_core_spark.transformations.truncation import (
            LimitKeysPerGroup,
            LimitRowsPerGroup,
            LimitRowsPerKeyPerGroup,
        )
        from tumult_core_spark.utils.misc import get_spark

        spark = get_spark("fuzz-trunc", cpus=2)
        INT64 = SparkIntegerColumnDescriptor(size=64)
        dom = SparkDataFrameDomain({"g": INT64, "u": INT64})
        grouped = IfGroupedBy("g", SymmetricDifference())
        if op == "limit_rows":
            t = LimitRowsPerGroup(dom, grouped, threshold)
        elif op == "limit_keys":
            t = LimitKeysPerGroup(dom, grouped, "u", threshold)
        elif op == "limit_rows_per_key":
            t = LimitRowsPerKeyPerGroup(dom, grouped, "u", threshold)
        else:
            nested = IfGroupedBy(
                "u", SumOf(IfGroupedBy("g", SymmetricDifference()))
            )
            t = LimitRowsPerKeyPerGroup(dom, nested, "u", threshold)

        drop_idx = drop_idx % len(rows)
        neighbor_rows = [r for i, r in enumerate(rows) if i != drop_idx]
        cols = ["g", "u"]
        in_d = self._distance(t.input_metric, rows, neighbor_rows, cols)
        if in_d == 0:
            return
        bound = float(
            ExactNumber(t.stability_function(in_d)).to_float(round_up=True)
        )
        base = [
            tuple(r)
            for r in t(spark.createDataFrame(rows, "g long, u long")).collect()
        ]
        nbr = [
            tuple(r)
            for r in t(
                spark.createDataFrame(neighbor_rows, "g long, u long")
            ).collect()
        ]
        out_d = self._distance(t.output_metric, base, nbr, cols)
        assert out_d <= bound + 1e-9, (
            f"{op} tau={threshold} rows={rows} drop={drop_idx}: "
            f"in_d={in_d} out_d={out_d} bound={bound}"
        )


@pytest.mark.slow  # stability fuzz: full lane only
class TestPublicJoinStabilityFuzz:
    """Randomized empirical check of PublicJoin's multiplicity-factor
    stability under the row-level metric and the row-counting
    IfGroupedBy inner (both fixed to multiply in r5)."""

    @given(
        priv=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=5),
            ),
            min_size=1,
            max_size=8,
        ),
        pub=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=2),
            ),
            min_size=1,
            max_size=8,
        ),
        drop_idx=st.integers(min_value=0, max_value=7),
        grouped=st.booleans(),
    )
    @settings(max_examples=10, deadline=None)
    def test_removal_neighbors(self, priv, pub, drop_idx, grouped):
        from collections import Counter

        from tumult_core_spark.domains import (
            SparkDataFrameDomain,
            SparkIntegerColumnDescriptor,
        )
        from tumult_core_spark.metrics import (
            IfGroupedBy,
            SumOf,
            SymmetricDifference,
        )
        from tumult_core_spark.transformations.join import PublicJoin
        from tumult_core_spark.utils.misc import get_spark

        spark = get_spark("fuzz-pj", cpus=2)
        INT64 = SparkIntegerColumnDescriptor(size=64)
        dom = SparkDataFrameDomain({"k": INT64, "x": INT64})
        metric = (
            IfGroupedBy("k", SumOf(SymmetricDifference()))
            if grouped
            else SymmetricDifference()
        )
        pub_df = spark.createDataFrame(pub, "k long, tag long")
        t = PublicJoin(dom, metric, pub_df)
        bound = float(
            ExactNumber(t.stability_function(1)).to_float(round_up=True)
        )
        drop_idx = drop_idx % len(priv)
        nbr_rows = [r for i, r in enumerate(priv) if i != drop_idx]

        def run(rows):
            if not rows:
                return Counter()
            return Counter(
                tuple(r)
                for r in t(spark.createDataFrame(rows, "k long, x long")).collect()
            )

        a, b = run(priv), run(nbr_rows)
        diff = sum((a - b).values()) + sum((b - a).values())
        # one removed private row joins to at most the multiplicity of
        # its key <= max multiplicity = claimed stability at d_in = 1
        assert diff <= bound + 1e-9, (
            f"priv={priv} pub={pub} drop={drop_idx} grouped={grouped}: "
            f"{diff} > {bound}"
        )


@pytest.mark.slow  # stability fuzz: full lane only
class TestPrivateJoinStabilityFuzz:
    """Randomized empirical stability of PrivateJoin across
    TRUNCATE/DROP strategy pairs: the claimed bound
    ``tau_l*s_r*d_r + tau_r*s_l*d_l`` (join.py:217-231, reference
    join.py:739-771) is a PRODUCT of per-stage claims, so the
    composite gets its own removal-neighbor fuzz on either side.
    Valid because truncation order is a content hash (xxhash64, no
    per-run salt), so both runs truncate identically-present rows the
    same way."""

    @given(
        left=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.integers(min_value=0, max_value=3),
            ),
            min_size=1,
            max_size=8,
        ),
        right=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.integers(min_value=0, max_value=3),
            ),
            min_size=1,
            max_size=8,
        ),
        tau_l=st.integers(min_value=1, max_value=2),
        tau_r=st.integers(min_value=1, max_value=2),
        strat_l=st.sampled_from(["TRUNCATE", "DROP"]),
        strat_r=st.sampled_from(["TRUNCATE", "DROP"]),
        drop_left=st.booleans(),
        drop_idx=st.integers(min_value=0, max_value=7),
    )
    @settings(max_examples=10, deadline=None)
    def test_removal_neighbors(
        self, left, right, tau_l, tau_r, strat_l, strat_r, drop_left, drop_idx
    ):
        from collections import Counter

        from tumult_core_spark.domains import (
            DictDomain,
            SparkDataFrameDomain,
            SparkIntegerColumnDescriptor,
        )
        from tumult_core_spark.transformations.join import (
            PrivateJoin,
            TruncationStrategy,
        )
        from tumult_core_spark.utils.misc import get_spark

        spark = get_spark("fuzz-prj", cpus=2)
        INT64 = SparkIntegerColumnDescriptor(size=64)
        dom = DictDomain(
            {
                "l": SparkDataFrameDomain({"k": INT64, "x": INT64}),
                "r": SparkDataFrameDomain({"k": INT64, "y": INT64}),
            }
        )
        t = PrivateJoin(
            dom,
            "l",
            "r",
            TruncationStrategy[strat_l],
            TruncationStrategy[strat_r],
            tau_l,
            tau_r,
        )
        base = {"l": left, "r": right}
        side = "l" if drop_left else "r"
        drop_idx = drop_idx % len(base[side])
        nbr = dict(base)
        nbr[side] = [r for i, r in enumerate(base[side]) if i != drop_idx]
        d_in = {"l": int(side == "l"), "r": int(side == "r")}
        bound = float(
            ExactNumber(t.stability_function(d_in)).to_float(round_up=True)
        )

        def run(tables):
            dfs = {
                "l": spark.createDataFrame(tables["l"], "k long, x long"),
                "r": spark.createDataFrame(tables["r"], "k long, y long"),
            }
            return Counter(tuple(r) for r in t(dfs).collect())

        a, b = run(base), run(nbr)
        diff = sum((a - b).values()) + sum((b - a).values())
        assert diff <= bound + 1e-9, (
            f"strats=({strat_l},{strat_r}) taus=({tau_l},{tau_r}) "
            f"side={side} drop={drop_idx} left={left} right={right}: "
            f"{diff} > {bound}"
        )


@pytest.mark.slow  # stability fuzz: full lane only
class TestFlatMapByKeyStabilityFuzz:
    """Randomized empirical stability of FlatMapByKey under
    ``IfGroupedBy(key, SymmetricDifference())``: the claimed identity
    stability rests on per-key independence of the trusted [Rows] ->
    [Rows] function — neighbors differing in one key's rows must
    change only that key's output groups (map.py:304+)."""

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=4),
            ),
            min_size=2,
            max_size=10,
        ),
        drop_idx=st.integers(min_value=0, max_value=9),
        drop_whole_group=st.booleans(),
    )
    @settings(max_examples=10, deadline=None)
    def test_random_neighbors(self, rows, drop_idx, drop_whole_group):
        from tumult_core_spark.domains import (
            SparkDataFrameDomain,
            SparkIntegerColumnDescriptor,
            SparkRowDomain,
        )
        from tumult_core_spark.metrics import IfGroupedBy, SymmetricDifference
        from tumult_core_spark.transformations.map import (
            FlatMapByKey,
            RowsToRowsTransformation,
        )
        from tumult_core_spark.utils.misc import get_spark

        spark = get_spark("fuzz-fmbk", cpus=2)
        INT64 = SparkIntegerColumnDescriptor(size=64)
        dom = SparkDataFrameDomain({"g": INT64, "u": INT64})
        # order-independent trusted fn: sorted distinct values + total
        rt = RowsToRowsTransformation(
            SparkRowDomain({"u": INT64}),
            SparkRowDomain({"s": INT64}),
            lambda rs: [{"s": v} for v in sorted({r["u"] for r in rs})]
            + [{"s": -sum(r["u"] for r in rs) - 1}],
        )
        metric = IfGroupedBy("g", SymmetricDifference())
        t = FlatMapByKey(dom, metric, rt)

        drop_idx = drop_idx % len(rows)
        if drop_whole_group:
            gone = rows[drop_idx][0]
            nbr_rows = [r for r in rows if r[0] != gone]
        else:
            nbr_rows = [r for i, r in enumerate(rows) if i != drop_idx]
        if not nbr_rows:
            return
        cols = ["g", "u"]
        dist = TestTruncationStabilityFuzz._distance
        in_d = dist(metric, rows, nbr_rows, cols)
        if in_d == 0:
            return
        bound = float(
            ExactNumber(t.stability_function(in_d)).to_float(round_up=True)
        )
        base = [
            tuple(r)
            for r in t(spark.createDataFrame(rows, "g long, u long")).collect()
        ]
        nbr = [
            tuple(r)
            for r in t(
                spark.createDataFrame(nbr_rows, "g long, u long")
            ).collect()
        ]
        out_d = dist(t.output_metric, base, nbr, ["g", "s"])
        assert out_d <= bound + 1e-9, (
            f"rows={rows} nbr={nbr_rows}: in_d={in_d} out_d={out_d} "
            f"bound={bound}"
        )


@pytest.mark.slow  # stability fuzz: full lane only
class TestGroupingFlatMapStabilityFuzz:
    """Randomized empirical stability of GroupingFlatMap: the claimed
    L2 bound d*sqrt(k) (and L1 d*k) under
    ``IfGroupedBy(new_col, RootSumOfSquared/SumOf(SymmetricDifference))``
    rests on per-row output distinctness of the new grouping column —
    one input row contributes at most one row to each of k groups
    (map.py:234+, reference map.py:1015-1028)."""

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=6),
            ),
            min_size=1,
            max_size=10,
        ),
        drop_idx=st.integers(min_value=0, max_value=9),
        k=st.integers(min_value=1, max_value=4),
        l2=st.booleans(),
    )
    @settings(max_examples=10, deadline=None)
    def test_removal_neighbors(self, rows, drop_idx, k, l2):
        from tumult_core_spark.domains import (
            SparkIntegerColumnDescriptor,
            SparkRowDomain,
        )
        from tumult_core_spark.metrics import (
            RootSumOfSquared,
            SumOf,
            SymmetricDifference,
        )
        from tumult_core_spark.transformations.map import (
            GroupingFlatMap,
            RowToRowTransformation,
            RowToRowsTransformation,
        )
        from tumult_core_spark.utils.misc import get_spark

        spark = get_spark("fuzz-gfm", cpus=2)
        INT64 = SparkIntegerColumnDescriptor(size=64)
        # trusted fn: fan each row out to a row-dependent subset of the
        # k buckets (bucket values distinct within a row); attempts to
        # exceed k rows or repeat a bucket are clipped by the operator
        rt = RowToRowsTransformation.__new__(RowToRowsTransformation)  # placeholder
        rt = RowToRowTransformation  # not used; keep import exercised
        inner = RowToRowsTransformation  # appease linters
        fan = RowToRowsTransformation
        del rt, inner, fan

        row_t = RowToRowsTransformation.__mro__  # noqa: F841

        def fn(row):
            n = (row["u"] % (k + 2)) + 1  # may exceed k: operator clips
            return [{"bucket": j} for j in range(n)] + [{"bucket": 0}]

        transformer = RowToRowsTransformation  # silence
        del transformer
        rtr = __import__(
            "tumult_core_spark.transformations.map", fromlist=["RowToRowsTransformation"]
        )
        row_transformer = rtr.RowToRowsTransformation  # noqa: F841

        from tumult_core_spark.transformations.map import (
            RowToRowsTransformation as R2RS,
        )

        rt2 = R2RS(
            SparkRowDomain({"a": INT64, "u": INT64}),
            SparkRowDomain({"a": INT64, "u": INT64, "bucket": INT64}),
            fn,
        )
        rt2.augment = True
        metric = RootSumOfSquared(SymmetricDifference()) if l2 else SumOf(
            SymmetricDifference()
        )
        t = GroupingFlatMap(metric, rt2, k)

        drop_idx = drop_idx % len(rows)
        nbr_rows = [r for i, r in enumerate(rows) if i != drop_idx]
        cols = ["a", "u"]
        dist = TestTruncationStabilityFuzz._distance
        in_d = dist(SymmetricDifference(), rows, nbr_rows, cols)
        if in_d == 0:
            return
        bound = float(
            ExactNumber(t.stability_function(in_d)).to_float(round_up=True)
        )
        schema = "a long, u long"
        base = [
            tuple(r) for r in t(spark.createDataFrame(rows, schema)).collect()
        ]
        nbr = [
            tuple(r)
            for r in t(spark.createDataFrame(nbr_rows, schema)).collect()
        ]
        out_d = dist(t.output_metric, base, nbr, ["a", "u", "bucket"])
        assert out_d <= bound + 1e-9, (
            f"rows={rows} nbr={nbr_rows} k={k} l2={l2}: "
            f"in_d={in_d} out_d={out_d} bound={bound}"
        )


@pytest.mark.slow  # stability fuzz: full lane only
class TestAddRemoveKeysLiftStabilityFuzz:
    """Randomized empirical stability of the AddRemoveKeys ``*Value``
    lifts (add_remove_keys.py:48-179; reference
    add_remove_keys.py:1-41 rationale): the claimed identity stability
    rests on the wrapped transformation never moving rows between key
    values, so a key-neighbor input (one uid's rows removed or
    rewritten) must change at most that one uid's rows in EVERY output
    table of the dict."""

    @staticmethod
    def _ark_distance(metric, out_a, out_b):
        """AddRemoveKeys distance between two output dicts: the number
        of key values whose row-multiset differs in ANY table."""
        from collections import Counter, defaultdict

        diff_keys = set()
        for tbl, kc in metric.df_to_key_column.items():
            per_key_a = defaultdict(Counter)
            per_key_b = defaultdict(Counter)
            for per_key, out in ((per_key_a, out_a), (per_key_b, out_b)):
                for row in out[tbl].collect():
                    d = row.asDict()
                    per_key[d[kc]][tuple(sorted(d.items()))] += 1
            for key in set(per_key_a) | set(per_key_b):
                if per_key_a[key] != per_key_b[key]:
                    diff_keys.add(key)
        return len(diff_keys)

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=4),
            ),
            min_size=1,
            max_size=10,
        ),
        pick=st.integers(min_value=0, max_value=9),
        mutate=st.booleans(),
        lift=st.sampled_from(["map", "flatmap", "flatmap_by_key", "public_join"]),
    )
    @settings(max_examples=12, deadline=None)
    def test_key_neighbors(self, rows, pick, mutate, lift):
        from tumult_core_spark.domains import (
            DictDomain,
            SparkDataFrameDomain,
            SparkIntegerColumnDescriptor,
            SparkRowDomain,
        )
        from tumult_core_spark.metrics import (
            AddRemoveKeys,
            IfGroupedBy,
            SymmetricDifference,
        )
        from tumult_core_spark.transformations.add_remove_keys import (
            FlatMapValue,
            MapValue,
            PublicJoinValue,
        )
        from tumult_core_spark.transformations.join import PublicJoin
        from tumult_core_spark.transformations.map import (
            FlatMap,
            Map,
            RowToRowsTransformation,
            RowToRowTransformation,
        )
        from tumult_core_spark.utils.misc import get_spark

        spark = get_spark("fuzz-ark", cpus=2)
        INT64 = SparkIntegerColumnDescriptor(size=64)
        table_dom = SparkDataFrameDomain({"uid": INT64, "x": INT64})
        dd = DictDomain({"t": table_dom})
        metric = AddRemoveKeys({"t": "uid"})
        in_schema = {"uid": INT64, "x": INT64}

        if lift == "map":
            t = Map(
                IfGroupedBy("uid", SymmetricDifference()),
                RowToRowTransformation(
                    SparkRowDomain(in_schema),
                    SparkRowDomain({**in_schema, "x2": INT64}),
                    lambda r: {"x2": r["x"] * 3 + r["uid"]},
                    augment=True,
                ),
            )
            tv = MapValue(dd, metric, t, "t", "t2")
        elif lift == "flatmap":
            t = FlatMap(
                IfGroupedBy("uid", SymmetricDifference()),
                RowToRowsTransformation(
                    SparkRowDomain(in_schema),
                    SparkRowDomain({**in_schema, "y": INT64}),
                    lambda r: [{"y": r["x"]}, {"y": r["x"] + r["uid"]}],
                    augment=True,
                ),
                max_num_rows=2,
            )
            tv = FlatMapValue(dd, metric, t, "t", "t2")
        elif lift == "flatmap_by_key":
            from tumult_core_spark.transformations.add_remove_keys import (
                FlatMapByKeyValue,
            )
            from tumult_core_spark.transformations.map import (
                FlatMapByKey,
                RowsToRowsTransformation,
            )

            t = FlatMapByKey(
                table_dom,
                IfGroupedBy("uid", SymmetricDifference()),
                RowsToRowsTransformation(
                    SparkRowDomain({"x": INT64}),
                    SparkRowDomain({"s": INT64}),
                    # whole-group function: output depends on ALL rows
                    # of the key, the case the per-row lifts can't hit
                    lambda rs: [
                        {"s": sum(r["x"] for r in rs)},
                        {"s": len(rs)},
                    ],
                ),
            )
            tv = FlatMapByKeyValue(dd, metric, t, "t", "t2")
        else:
            public = spark.createDataFrame(
                [(0, 10), (0, 11), (1, 12), (2, 13), (2, 13), (3, 14)],
                "uid long, tag long",
            )
            t = PublicJoin(table_dom, SymmetricDifference(), public)
            tv = PublicJoinValue(dd, metric, t, "t", "t2")

        # key-neighbor: remove ALL rows of one uid, or rewrite one of
        # its rows in place — both are AddRemoveKeys distance 1
        pick_uid = rows[pick % len(rows)][0]
        if mutate:
            nbr_rows = [
                (u, x + 1 if u == pick_uid else x) for (u, x) in rows
            ]
        else:
            nbr_rows = [r for r in rows if r[0] != pick_uid]
        if sorted(nbr_rows) == sorted(rows):
            return
        bound = float(
            ExactNumber(tv.stability_function(1)).to_float(round_up=True)
        )

        def run(rs):
            return tv(
                {"t": spark.createDataFrame(rs, "uid long, x long")}
                if rs
                else {
                    "t": spark.createDataFrame([], "uid long, x long")
                }
            )

        out_d = self._ark_distance(tv.output_metric, run(rows), run(nbr_rows))
        assert out_d <= bound + 1e-9, (
            f"lift={lift} rows={rows} nbr={nbr_rows} uid={pick_uid}: "
            f"out_d={out_d} > bound={bound}"
        )


# ---------------------------------------------------------------------------
# PNG codec: encode(decode) must be the identity for every image shape,
# channel count, and scanline filter type (pure driver-side property —
# no Spark session needed).
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),   # height
    st.integers(min_value=1, max_value=24),   # width
    st.sampled_from([1, 2, 3, 4]),            # channels
    st.sampled_from([0, 1, 2, 3, 4]),         # filter type
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
)
def test_png_roundtrip_is_identity(h, w, ch, ftype, seed):
    import numpy as np

    from tumult_core_spark.extensions.multimodal import _decode_png, _encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    back = _decode_png(_encode_png(img, filter_type=ftype))
    assert back.shape == img.shape
    assert (back == img).all()


def test_distinct_seed_selections_compose_independently():
    # Regression for the fixed-multiplier design: K*(id+s2) differs
    # from K*(id+s1) by a CONSTANT, so two selections over the same
    # ids were interval-correlated at any pair of seeds (a top-decile
    # test split composed with a 0.5 sample could return ZERO rows).
    # With the per-seed multiplier, a 0.5-sample of the test split
    # keeps ~half of it.
    n = 20_000
    hi = int(0.9 * 2**32)
    test_ids = [i for i in range(n) if _mix_split_py(i, 7) >= hi]
    assert len(test_ids) > 1500
    kept = [i for i in test_ids if _mix_split_py(i, 11) < int(0.5 * 2**32)]
    rate = len(kept) / len(test_ids)
    assert 0.42 < rate < 0.58, rate
    # the SAME seed still nests by construction (the feature)
    nested = [i for i in range(n) if _mix_split_py(i, 7) >= int(0.95 * 2**32)]
    assert set(nested) <= set(test_ids)
