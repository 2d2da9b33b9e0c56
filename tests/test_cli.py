"""CLI mode tests (reference Main.hs modes re-expressed)."""

import io
import sys

import pytest

from nerfray.__main__ import main
from nerfray.sources import enamex_source


@pytest.fixture(scope="module")
def gold_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "gold.nes")
    enamex_source.write_gold_fixture(path, n_train=40)
    return path


def test_cli_train_and_ner(gold_file, tmp_path, capsys, monkeypatch):
    model_path = str(tmp_path / "m.bin")
    assert main(["train", gold_file, "-o", model_path, "--iter", "4"]) == 0
    out = capsys.readouterr().out
    assert "trained on" in out

    src = str(tmp_path / "in.txt")
    with open(src, "w") as f:
        f.write("import numpy\ndef func_1():\n")
    assert main(["ner", model_path, src]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "import <library>numpy</library>"
    assert "<symbol>func_1</symbol>" in out[1]


def test_cli_cv(gold_file, capsys):
    assert main(["cv", gold_file, "-k", "2", "--iter", "3"]) == 0
    out = capsys.readouterr().out
    assert "fold 0" in out and "fold 1" in out
    import re
    for line in out.strip().splitlines():
        p = float(re.search(r"P=([\d.]+)", line).group(1))
        r = float(re.search(r"R=([\d.]+)", line).group(1))
        assert p >= 0.95 and r >= 0.95, line  # north-rule gate


def test_cli_compare_self_is_perfect(gold_file, capsys):
    assert main(["compare", gold_file, gold_file]) == 0
    out = capsys.readouterr().out
    assert "<all>:" in out
    assert "P=1.0000 R=1.0000" in out.strip().splitlines()[-1]


def test_cli_ox(tmp_path, capsys):
    src = str(tmp_path / "in.txt")
    with open(src, "w") as f:
        f.write("import os\n")
    assert main(["ox", src]) == 0
    out = capsys.readouterr().out
    assert out.startswith("import\t")
    assert "os\t" in out
