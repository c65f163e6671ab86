"""Picklable / PicklableMap string-format tests (tests/test_utils.cu
equivalent): round trips, separators, and the exact reference pickle layout
("key,coeff0,coeff1,..." joined by newlines, Utils.h:46,82)."""

from cuhe_tpu.serialize import Picklable, PicklableMap


def test_picklable_roundtrip():
    p = Picklable("sk0", [1, 22, 333, -4, 0])
    s = p.pickle()
    assert s == "sk0,1,22,333,-4,0"
    q = Picklable.from_string(s)
    assert q.key == "sk0"
    assert q.coeffs == [1, 22, 333, -4, 0]


def test_picklable_values_string():
    p = Picklable("k", [7, 8])
    assert p.values_string() == "7,8"


def test_picklable_custom_separator():
    p = Picklable("k", [1, 2, 3], separator=" ")
    assert p.pickle() == "k 1 2 3"
    q = Picklable.from_string("k 1 2 3", separator=" ")
    assert q.coeffs == [1, 2, 3]


def test_picklable_map_roundtrip():
    m = PicklableMap([Picklable("a", [1, 2]), Picklable("b", [3])])
    s = m.to_string()
    assert s == "a,1,2\nb,3"
    m2 = PicklableMap.from_string(s)
    assert m2.get("a").coeffs == [1, 2]
    assert m2.get("b").coeffs == [3]
    assert m2.has("a") and not m2.has("c")


def test_picklable_map_missing_key():
    m = PicklableMap([Picklable("a", [1])])
    try:
        m.get("zzz")
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_big_coefficients():
    big = 2**512 + 12345
    p = Picklable("q", [big, -big])
    q = Picklable.from_string(p.pickle())
    assert q.coeffs == [big, -big]
