"""Pins for prefix/suffix/shape/pack edge semantics (SURVEY.md §8.4)."""

from nerfray.core.ox import pack, prefix, shape, suffix


def test_prefix_positive():
    assert prefix(2, "warsaw") == "wa"
    assert prefix(6, "warsaw") == "warsaw"
    assert prefix(7, "warsaw") is None  # k > len -> no observation


def test_prefix_trim():
    assert prefix(0, "abc") == "abc"
    assert prefix(-1, "abc") == "ab"
    assert prefix(-3, "abc") is None   # nothing would remain
    assert prefix(-4, "abc") is None


def test_suffix_positive():
    assert suffix(3, "warsaw") == "saw"
    assert suffix(6, "warsaw") == "warsaw"
    assert suffix(7, "warsaw") is None


def test_suffix_trim():
    assert suffix(0, "abc") == "abc"
    assert suffix(-1, "abc") == "bc"
    assert suffix(-3, "abc") is None


def test_shape():
    assert shape("Ab1-ć") == "uldxl"
    assert shape("") == ""


def test_pack():
    assert pack("uull") == "ul"
    assert pack("ululu") == "ululu"
    assert pack("") == ""
    assert pack(shape("Abc-12")) == "ulxd"
