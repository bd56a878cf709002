"""Java Double.toString / DecimalFormat parity tests (golden values produced
by Java semantics; see report/java_format.py)."""

import pytest

from genestrip_tpu.report.java_format import decimal_format_8, java_double_str

CASES = [
    (0.0, "0.0"),
    (-0.0, "-0.0"),
    (1.0, "1.0"),
    (-2.5, "-2.5"),
    (0.1, "0.1"),
    (3.14, "3.14"),
    (100.0, "100.0"),
    (0.001, "0.001"),
    (0.0001, "1.0E-4"),
    (0.00099, "9.9E-4"),
    (1234567.0, "1234567.0"),
    (9999999.0, "9999999.0"),
    (12345678.0, "1.2345678E7"),
    (1e7, "1.0E7"),
    (1e23, "1.0E23"),
    (1.5e-7, "1.5E-7"),
    (1 / 3, "0.3333333333333333"),
    (2 / 3, "0.6666666666666666"),
    (41.0, "41.0"),
    (0.025, "0.025"),
    (123.456, "123.456"),
    (float("nan"), "NaN"),
    (float("inf"), "Infinity"),
    (float("-inf"), "-Infinity"),
]


@pytest.mark.parametrize("x,want", CASES)
def test_java_double_str(x, want):
    assert java_double_str(x) == want


def test_roundtrip_random():
    import random
    rng = random.Random(7)
    for _ in range(2000):
        x = rng.uniform(-1e9, 1e9) * 10 ** rng.randint(-12, 12)
        s = java_double_str(x)
        # must round-trip (shortest-unique digits requirement)
        assert float(s.replace("E", "e")) == x


def test_decimal_format_8():
    assert decimal_format_8(0.0) == "0.00000000"
    assert decimal_format_8(1.23456789123) == "1.23456789"
    assert decimal_format_8(0.5) == "0.50000000"
    # HALF_EVEN
    assert decimal_format_8(0.000000125) == "0.00000012"
    assert decimal_format_8(0.000000135) == "0.00000014"
