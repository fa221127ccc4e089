"""Property-based pins for the Go-faithful scalar functions."""

from hypothesis import given, settings
from hypothesis import strategies as st

from gocrawler_spark import gofuncs as go


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200)
def test_currency_cents_roundtrip(cents):
    # Float64() then ToCurrency must return the same cents
    # (SetPrice(price.Float64()) round-trip, mixup.go:155)
    assert go.to_currency_cents(cents / 100) == cents


@given(st.floats(min_value=0, max_value=10**9, allow_nan=False))
@settings(max_examples=200)
def test_currency_truncation_matches_go(f):
    # Currency((f*100)+0.5): Go float->int64 truncates toward zero
    import math

    assert go.to_currency_cents(f) == math.trunc(f * 100 + 0.5)


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
@settings(max_examples=200)
def test_parse_float_never_accepts_whitespace_wrapped(s):
    v, ok = go.parse_float(" " + s + " ")
    assert (v, ok) == (0.0, False)


@given(st.lists(st.text(alphabet="abc/", max_size=8), min_size=1, max_size=4))
@settings(max_examples=100)
def test_create_id_is_md5_of_joined(parts):
    assert go.create_id(*parts) == go.md5_hex("/".join(parts))


@given(st.text(alphabet=" \t\r\n\va", max_size=30))
@settings(max_examples=200)
def test_trim_and_fields_consistent(s):
    t = go.trim_space(s)
    assert t == "" or (t[0] not in " \t\r\n\v" and t[-1] not in " \t\r\n\v")
    # for ASCII whitespace + 'a', Go Fields == Python str.split()
    assert go.fields(s) == s.split()
