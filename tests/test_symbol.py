import pytest

from cora_tpu.symbol import Symbol, key, pair_matches


def test_symbol_roundtrip():
    s = Symbol("A", 17)
    assert s.chr == "A"
    assert s.index == 17
    assert s.string() == "A17"
    assert Symbol("A17") == s
    assert Symbol(s.key()) == s


def test_symbol_ordering():
    assert Symbol("A", 1) < Symbol("A", 2)
    assert Symbol("A", 99) < Symbol("B", 0)


def test_symbol_hashable_dict_key():
    d = {Symbol("x", 1): 0, Symbol("x", 2): 1}
    assert d[Symbol("x1")] == 0


def test_key_shorthand():
    assert key("a", 3) == Symbol("a", 3).key()


def test_invalid_symbols():
    with pytest.raises(ValueError):
        Symbol("AB", 1)
    with pytest.raises(ValueError):
        Symbol("A", -1)
    with pytest.raises(ValueError):
        Symbol("17")


def test_pair_matches_unordered():
    a, b = Symbol("A", 0), Symbol("B", 4)
    assert pair_matches((a, b), (b, a))
    assert not pair_matches((a, b), (a, Symbol("B", 5)))


def test_shorthand_constructors():
    """Reference `Symbol.h` `shorthand::A..Z` (and lowercase)."""
    from cora_tpu.symbol import Symbol, shorthand

    assert shorthand.A(0) == Symbol("A", 0).key()
    assert shorthand.Z(123) == Symbol("Z", 123).key()
    assert shorthand.b(5) == Symbol("b", 5).key()
    assert Symbol(shorthand.L(42)) == Symbol("L", 42)
