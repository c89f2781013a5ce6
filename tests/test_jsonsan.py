"""Dirty-JSON recovery kernel: one test per reference strategy
(json_utils.py:140-184) plus the repair pass (json_utils.py:28-99)."""

import json

import pytest

from service1_text_extraction_spark.kernels.jsonsan import (
    parse_ai_response,
    sanitize_json_string,
    safe_json_loads,
)


def test_clean_json_passthrough():
    s = '{"a": 1, "b": [2, 3]}'
    assert sanitize_json_string(s) == s
    assert safe_json_loads(s) == {"a": 1, "b": [2, 3]}


def test_trailing_comma_repair():
    assert safe_json_loads('{"a": 1,}') == {"a": 1}
    assert safe_json_loads('[1, 2, 3, ]') == [1, 2, 3]
    assert safe_json_loads('{"a": {"b": 2,},}') == {"a": {"b": 2}}


def test_control_char_repair():
    obj = safe_json_loads('{"a": "line1\nline2\ttab"}')
    assert obj == {"a": "line1\nline2\ttab"}


def test_inner_quote_repair():
    obj = safe_json_loads('{"a": "say "hi" now", "b": 1}')
    assert obj == {"a": 'say "hi" now', "b": 1}


def test_already_escaped_content_untouched():
    s = '{"a": "back\\\\slash \\"quoted\\""}'
    assert safe_json_loads(s) == json.loads(s)


def test_strategy_direct():
    obj, strat = parse_ai_response('  {"k": 7}  ')
    assert (obj, strat) == ({"k": 7}, "direct")


def test_strategy_direct_with_repair():
    obj, strat = parse_ai_response('{"k": 7,}')
    assert (obj, strat) == ({"k": 7}, "direct")


def test_strategy_fenced():
    text = 'Sure!\n```json\n{"k": 9}\n```\nthanks'
    assert parse_ai_response(text) == ({"k": 9}, "fenced")
    # bare fence without the json tag
    assert parse_ai_response('```\n[1, 2]\n```') == ([1, 2], "fenced")


def test_strategy_bare():
    text = 'The result is {"k": 3} as requested.'
    assert parse_ai_response(text) == ({"k": 3}, "bare")


def test_strategy_none():
    assert parse_ai_response("") == (None, "none")
    assert parse_ai_response(None) == (None, "none")
    assert parse_ai_response("no json here") == (None, "none")


def test_direct_failure_does_not_fall_through():
    # mirrors the reference: a {-prefixed payload that cannot be
    # repaired short-circuits the ladder (safe_json_loads raises
    # through parse_ai_response's outer handler)
    obj, strat = parse_ai_response('{this is not json {"k": 1}')
    assert (obj, strat) == (None, "none")


@pytest.mark.parametrize(
    "dirty,expected",
    [
        ('{"a": 1', None),  # unclosed - unrepairable
        ("{{{{", None),
    ],
)
def test_unrepairable_raises(dirty, expected):
    with pytest.raises(json.JSONDecodeError):
        safe_json_loads(dirty)


def test_pretty_printed_multiline_repair():
    """Closing quotes at end-of-line (pretty-printed JSON) must not be
    escaped as stray inner quotes while repairing a raw control char."""
    dirty = '{"a": "line1\nline2",\n "b": "x"\n}'
    assert safe_json_loads(dirty) == {"a": "line1\nline2", "b": "x"}
    dirty2 = '{\n "a": "v",\n "b": "w"\n,}'
    assert safe_json_loads(dirty2) == {"a": "v", "b": "w"}


def test_coerce_k_never_crashes_the_batch():
    """Arrow-batch safety: every weird recovered 'k' maps to None or a
    genuinely-integral int, never an exception (review r3: Infinity
    raised OverflowError; ints past int64 crashed Arrow serialization;
    ADVICE r3: 3.9 must NOT floor-truncate to 3 and bools must not
    report as 0/1 counts)."""
    from service1_text_extraction_spark.functions.jsonfuncs import _coerce_k

    assert _coerce_k(3) == 3
    assert _coerce_k(3.0) == 3  # integral float passes
    assert _coerce_k("41") == 41
    for bad in (
        3.9, -0.5, True, False,  # non-integral / bool -> NULL
        float("inf"), float("-inf"), float("nan"), "3.5x", "", None,
        {"nested": 1}, [1], 2**63, -(2**63) - 1, 10**25, "9" * 30,
    ):
        assert _coerce_k(bad) is None, bad
