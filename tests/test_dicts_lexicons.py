"""Dict algebra (Dict/Base.hs) + lexical-resource readers (S6-S10)."""

from nerfray import dicts
from nerfray.sources import lexicons


def test_build_dict_union_and_atomic():
    d = dicts.build_dict([("os", "library"), ("os", "module"),
                          ("MIT License", "license"), ("a", "x")])
    assert d == {"os": ("library", "module"), "a": ("x",)}
    d2 = dicts.build_dict([("MIT License", "license")], atomic=False)
    assert d2 == {"MIT License": ("license",)}


def test_merge_and_diff():
    a = {"x": ("1",)}
    b = {"x": ("2",), "y": ("3",)}
    assert dicts.merge([a, b]) == {"x": ("1", "2"), "y": ("3",)}
    assert dicts.diff([a, b]) == {"x": ("0:1", "1:2"), "y": ("1:3",)}


def test_sift():
    d = {"ab": ("x",), "abc": ("y",)}
    assert dicts.sift(lambda f, ls: len(f) > 2, d) == {"abc": ("y",)}


def test_link_argmax_and_open_vocab():
    al = dicts.alias_table()
    assert dicts.link("os", "library", al) == ("lib:os", 1.0)
    # ambiguous bare form: api candidate exists at lower weight
    assert dicts.link("os", "api", al) == ("api:os", 0.3)
    assert dicts.link("os.load", "api", al) == ("api:os.load", 1.0)
    assert dicts.link("Apache License 2.0", "license", al) == \
        ("license:Apache-2.0", 1.0)
    assert dicts.link("anything_42", "symbol", al) == ("sym:anything_42", 1.0)
    assert dicts.link("unknown", "library", al) == (None, 0.0)
    assert dicts.link("Apache", "vendor", al) == (None, 0.0)


def test_polimorf():
    text = "Warszawa\twarszawa\tsubst\tmiasto\npies\tpies\tsubst\tpospolita\nx\ty\tz\t\n"
    assert lexicons.parse_polimorf(text) == [("Warszawa", "miasto")]


def test_nelexicon():
    assert lexicons.parse_nelexicon("city; New York\nbad line\n") == \
        [("New York", "city")]


def test_prolexbase():
    assert lexicons.parse_prolexbase("Paris\tParis\tN\tcity\nshort\tline\n") == \
        [("Paris", "city")]


def test_pnet_split():
    text = ("ul.\tulica\tbrev\tint\tstreet\tul. Marszałkowska\n"
            "prof.\tprofesor\tbrev\text\tperson\tprof. Nowak\n")
    rows = lexicons.parse_pnet(text)
    assert lexicons.pnet_triggers(rows, "int") == [("ul.", "street")]
    assert lexicons.pnet_triggers(rows, "ext") == [("prof.", "person")]


def test_pneg():
    xml = """
    <LexicalResource>
      <LexicalEntry id="1">
        <Lemma><feat att="writtenForm" val="ONZ"/></Lemma>
        <WordForm><feat att="writtenForm" val="ONZ-u"/></WordForm>
        <Sense><feat att="externalReference" val="organization"/></Sense>
      </LexicalEntry>
    </LexicalResource>"""
    assert sorted(lexicons.parse_pneg(xml)) == \
        [("ONZ", "organization"), ("ONZ-u", "organization")]


def test_dict_artifact_round_trip(tmp_path):
    """S12 parity (Dict/Base.hs:77-83): save/load a dict artifact."""
    from nerfray import dicts
    d = dicts.build_dict([("numpy", "library"), ("numpy", "module"),
                          ("os.load", "api"), ("MIT", "vendor")])
    p = str(tmp_path / "lex.parquet")
    dicts.save_dict(d, p)
    assert dicts.load_dict(p) == d


def test_user_lexicon_file_into_schema(tmp_path):
    """A user-supplied lexicon file flows file -> dict -> schema conf ->
    observations (the reference Dict.hs CLI path)."""
    from nerfray import dicts
    from nerfray.core import schema

    lex = tmp_path / "user.tsv"
    lex.write_text("leftpad\tleftpad\tsubst\tcustomlib\n"
                   "mit license\tmit\tsubst\tlicensey\n",  # multiword: drop
                   encoding="utf-8")
    d = dicts.user_dict_from_file(str(lex))
    assert d == {"leftpad": ("customlib",)}

    # parquet artifact path works identically
    p = str(tmp_path / "user.parquet")
    dicts.save_dict(d, p)
    assert dicts.user_dict_from_file(p) == d

    conf = schema.default_conf(ne_dicts=[("user", d)])
    obs = schema.schematize(conf, ["import", "leftpad"])
    assert any("user" in o and "customlib" in o for o in obs[1]), obs[1]
