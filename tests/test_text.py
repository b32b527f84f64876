"""Text frontend golden tests (parity targets from reference utils/text.py)."""

import pytest

from tacotron2_tpu.text import (EOS_ID, PAD_ID, sequence_to_text, symbols,
                                text_to_sequence)
from tacotron2_tpu.text.numbers import normalize_numbers, number_to_words


def test_symbol_inventory():
    # Reference symbols.py:17 — 67 symbols, pad first, eos second.
    assert len(symbols) == 66  # pad + eos + 64 chars (reference symbols.py:11)
    assert symbols[PAD_ID] == "_"
    assert symbols[EOS_ID] == "~"
    assert "A" in symbols and "z" in symbols and " " in symbols


def test_roundtrip_and_eos():
    seq = text_to_sequence("Hello, World!", ["english_cleaners"])
    assert seq[-1] == EOS_ID
    assert sequence_to_text(seq[:-1]) == "Hello, World!"


def test_arpabet_curly_braces():
    seq = text_to_sequence("Turn left on {HH AW1 S} Street.", ["english_cleaners"])
    text = sequence_to_text(seq[:-1])
    assert "{HH}" in text or "{HH AW1 S}" in text.replace("} {", " ").replace(" ", " ")


def test_whitespace_collapse_and_case_preserved():
    seq = text_to_sequence("A  B\t C", ["english_cleaners"])
    assert sequence_to_text(seq[:-1]) == "A B C"


@pytest.mark.parametrize("n,words", [
    (0, "zero"),
    (7, "seven"),
    (15, "fifteen"),
    (21, "twenty-one"),
    (100, "one hundred"),
    (101, "one hundred one"),
    (342, "three hundred forty-two"),
    (1000, "one thousand"),
    (1234567, "one million, two hundred thirty-four thousand, five hundred sixty-seven"),
])
def test_number_to_words_plain(n, words):
    assert number_to_words(n, andword="") == words


@pytest.mark.parametrize("text,expected", [
    ("1999", "nineteen ninety-nine"),          # year-style group reading
    ("2000", "two thousand"),
    ("2008", "two thousand eight"),
    ("1800", "eighteen hundred"),
    ("1805", "eighteen oh five"),
    ("13", "thirteen"),
    ("3000", "three thousand"),
    ("1,234", "twelve thirty-four"),           # comma removed → 1234 year-style
    ("$1.50", "one dollar, fifty cents"),
    ("$2", "two dollars"),
    ("$0.99", "ninety-nine cents"),
    ("£100", "one hundred pounds"),
    ("3.14", "three point fourteen"),  # decimal digits re-expanded, as in reference
    ("21st", "twenty-first"),
    ("3rd", "third"),
    ("12th", "twelfth"),
    ("20th", "twentieth"),
])
def test_normalize_numbers(text, expected):
    assert normalize_numbers(text) == expected


def test_cleaner_abbreviations():
    seq = text_to_sequence("Dr. Smith met Mr. Jones.", ["english_cleaners"])
    assert sequence_to_text(seq[:-1]) == "doctor Smith met mister Jones."


def test_unicode_transliteration():
    seq = text_to_sequence("café naïve — “quoted”", ["english_cleaners"])
    out = sequence_to_text(seq[:-1])
    assert out == 'cafe naive - "quoted"'
