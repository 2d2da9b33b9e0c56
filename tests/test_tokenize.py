"""Tokenizer pins (SURVEY.md §2.2 M1, §8.5; Tokenize.hs:41-50)."""

from nerfray.core.tokenize import essence_intervals, tokenize, words


def test_whitespace_split():
    assert words("a b  c") == ["a", "b", "c"]
    assert words("  leading and trailing  ") == ["leading", "and", "trailing"]
    assert words("") == []
    assert words("   ") == []


def test_punctuation_split_leading_trailing_only():
    assert words("(hello),") == ["(", "hello", ")", ","]
    # internal punctuation stays inside the token
    assert words("json.load()") == ["json.load", "(", ")"]
    assert words("don't") == ["don't"]
    assert words('require("os")') == ["require(\"os", '"', ")"]
    assert words("...") == [".", ".", "."]


def test_uris_kept_whole():
    assert words("see https://ex.com/a,b?x=1 now") == \
        ["see", "https://ex.com/a,b?x=1", "now"]
    assert words("www.example.com.") == ["www.example.com."]


def test_offsets_index_source():
    text = "  foo (bar)."
    for t in tokenize(text):
        assert text[t.start:t.end] == t.text


def test_non_punct_symbols_not_split():
    # '=' is category Sm, not P* — stays whole
    assert words("a = b") == ["a", "=", "b"]
    assert words(":=") == [":", "="]


def test_essence_intervals():
    toks = tokenize("ab  cd e")
    assert essence_intervals(toks) == [(0, 2), (2, 4), (4, 5)]
